package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one registered query and print its FINAL adaptive
  * plan — `df.explain` before an action shows `isFinalPlan=false` with
  * none of AQE's runtime decisions (broadcast demotions, skew splits,
  * ReusedExchange dedup of repeated subtrees), which is exactly the
  * information plan audits sometimes need. Usage:
  * `runMain graft.tools.PlanDump <queryName> [sfDir]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p35_semdedup")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // execute THIS dataframe's own plan — df.count() builds a separate
    // aggregate plan and would leave this one un-finalized
    val n = df.collect().length
    val p = df.queryExecution.executedPlan.toString
    println(s"[plandump] $name rows=$n")
    println(p)
    println(s"[plandump] ReusedExchange=${"ReusedExchange".r.findAllIn(p).length} " +
      s"Exchange=${"Exchange".r.findAllIn(p).length} " +
      s"isFinalPlan=${p.contains("isFinalPlan=true")}")
    spark.stop()
  }
}
