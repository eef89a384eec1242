package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries (twice each) and optionally dump the
  * formatted physical plan. `runMain graft.Profile <sfDir> <name>...`;
  * set GRAFT_EXPLAIN=1 to print each query's plan before running it.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("g03_filter_regex", "g14_stats_fold")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
        SparkEntry.queries(n)(spark, d).explain("formatted")
      val r1 = once(n); val r2 = once(n)
      println(f"[prof] $n: min ${math.min(r1, r2)}%.2f s (runs $r1%.2f / $r2%.2f)")
    }
    spark.stop()
  }
}
