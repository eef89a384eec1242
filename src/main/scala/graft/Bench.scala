package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/executor/codegen bootstrap so fixed engine-warmup cost
    // isn't charged to whichever query happens to run first: exercise the
    // heavy codegen shapes (shuffle join, hash agg, window, exchange) on
    // tiny synthetic data — the SF-dir parquet is deliberately NOT
    // touched, so measured scan/IO work stays honest
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val a = spark.range(1000).select(col("id"), (col("id") % 7).as("g"))
      a.join(a.withColumnRenamed("id", "id2"), "g")
        .groupBy("g").agg(count(lit(1)), sum("id"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("g")).orderBy(col("g"))))
        .filter(col("rn") >= 0).count()
    }
    // sorted order keeps per-query attribution stable across rounds
    // (shared-cache materialization always lands on the same first query).
    // The noop sink forces FULL execution — count() would let Catalyst
    // eliminate global sorts and prune every projected expression, timing
    // a bare scan for projection-only queries. Failures are reported as
    // -1 in the JSON (not swallowed into a plausible-looking timing).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // the driver captures only a bounded stdout TAIL: millisecond
    // precision keeps the whole JSON line ~2 KB so the head is never
    // truncated away (full-precision doubles overflowed the tail window
    // in rounds 1-2 and the driver recorded parsed:null)
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
