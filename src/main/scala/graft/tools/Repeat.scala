package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev measurement harness: run named queries K times each in ONE warmed
  * session and print every run plus the min — the bench's min-of-2 is too
  * coarse for optimization A/Bs on a rig whose run-to-run spread routinely
  * hits 1.5–3× (BENCH_NOTES). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.Repeat <q1,q2,...> [reps] [sfDir] [cpus]
  */
object Repeat {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("g37").split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(3).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = graft.core.Masters.configure(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup shapes as Bench
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val a = spark.range(1000).select(col("id"), (col("id") % 7).as("g"))
    a.join(a.withColumnRenamed("id", "id2"), "g")
      .groupBy("g").agg(count(lit(1)), sum("id"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("g")).orderBy(col("g"))))
      .filter(col("rn") >= 0).count()
    for (name <- names) {
      val full = graft.SparkEntry.queries.keys.filter(_.startsWith(name)).toSeq match {
        case Seq(one) => one
        case Seq() => name
        case many => throw new IllegalArgumentException(s"ambiguous prefix $name: $many")
      }
      val fn = graft.SparkEntry.queries(full)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[repeat] $full min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f " +
        times.map(t => f"$t%.2f").mkString("runs=[", ",", "]"))
    }
    spark.stop()
  }
}
