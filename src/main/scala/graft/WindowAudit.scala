package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Dev tool: list queries whose physical plan contains an unpartitioned
  * Window (single-partition hazard). `runMain graft.WindowAudit [sfDir]`.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.operators.Registry.all.foreach { q =>
      try {
        val plan = q.fn(spark, d).queryExecution.sparkPlan
        val globals = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty)
          println(s"[winaudit] GLOBAL-WINDOW ${q.name} (${globals.size})")
      } catch { case e: Throwable =>
        println(s"[winaudit] ERROR ${q.name}: ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    spark.stop()
  }
}
