package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Ckpt._

/** Dev probe: does a localCheckpoint boundary preserve the child plan's
  * hash partitioning (a) under AQE, (b) with AQE disabled? The iterative
  * plans checkpoint per round; if the leaf comes back UnknownPartitioning
  * every round re-exchanges the loop-static tables (edges, vertices) —
  * the per-round plan audit of r17 found exactly that in g52's final
  * plan. This probe prints the captured leaf partitioning and the
  * exchange count of a co-partitioned join under both settings.
  */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def leafPart(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
      }.mkString(";")

    def probe(tag: String): Unit = {
      val e = spark.range(10000).select((col("id") % 500).as("src"), (col("id") % 700).as("dst"))
        .distinct().repartition(col("src")).lckpt(eager = false)
      val r = spark.range(500).select(col("id").as("key"), lit(1000000L).as("rank"))
        .groupBy("key").agg(sum("rank").as("rank")).lckpt(eager = false)
      println(s"[$tag] e leaf partitioning: " + leafPart(e))
      println(s"[$tag] r leaf partitioning: " + leafPart(r))
      val j = e.join(r, col("src") === col("key"))
        .groupBy("dst").agg(sum(expr("rank div 1")).as("inc"))
      j.write.format("noop").mode("overwrite").save()
      val p = j.queryExecution.executedPlan.toString
      val nEx = "(?<!Reused)Exchange".r.findAllIn(p).length
      println(s"[$tag] join+agg exchanges=$nEx")
      println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan ExistingRDD") || l.contains("Join")).map(_.trim).mkString("\n"))
    }

    probe("aqe-on")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    probe("aqe-off")
    spark.stop()
  }
}
