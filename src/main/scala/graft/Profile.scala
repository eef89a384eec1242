package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    t("warmup read emb")(spark.read.parquet(s"$d/embeddings.parquet").count())
    t("p09 run1")(SparkEntry.queries("p09_cosine_topk")(spark, d).count())
    t("p09 run2")(SparkEntry.queries("p09_cosine_topk")(spark, d).count())
    t("cache build (first g-query)")(SparkEntry.queries("g03_filter_regex")(spark, d).count())
    t("g03 run2")(SparkEntry.queries("g03_filter_regex")(spark, d).count())
    t("g07 run1")(SparkEntry.queries("g07_hyperedge_motif")(spark, d).count())
    t("g07 run2")(SparkEntry.queries("g07_hyperedge_motif")(spark, d).count())
    t("g05 run2")(SparkEntry.queries("g05_two_hop")(spark, d).count())
    t("p12 stream")(SparkEntry.queries("p12_stream_hourly")(spark, d).count())
    spark.stop()
  }
}
