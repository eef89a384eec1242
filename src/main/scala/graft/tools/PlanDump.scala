package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one or more registered queries and print/save their
  * plans — `df.explain` before an action shows `isFinalPlan=false` with
  * none of AQE's runtime decisions (broadcast demotions, skew splits,
  * ReusedExchange dedup of repeated subtrees), which is exactly the
  * information plan audits sometimes need. Usage:
  * `runMain graft.tools.PlanDump <q1,q2,...> [sfDir] [outTemplate]`
  * where `outTemplate` contains `%s` (e.g. `plans/r16/%s_before.txt`);
  * when given, each query's `.explain("formatted")` output PLUS the
  * final adaptive executed plan are written there instead of stdout.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("p35_semdedup").split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outTemplate = args.lift(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      // exact-or-unique-prefix resolution (ADVICE r16: find() over an
      // unordered Map resolved ambiguous prefixes nondeterministically,
      // so a dump could silently be written for the wrong query)
      val full = graft.SparkEntry.queries.keys.filter(_.startsWith(name)).toSeq match {
        case Seq(one) => one
        case Seq() => name
        case many => many.find(_ == name).getOrElse(
          throw new IllegalArgumentException(
            s"ambiguous query prefix '$name': ${many.sorted.mkString(", ")}"))
      }
      val df = graft.SparkEntry.queries(full)(spark, sfDir)
      // the formatted plan BEFORE execution (the judge-readable operator
      // list with PushedFilters/ReadSchema per scan)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // execute THIS dataframe's own plan — df.count() builds a separate
      // aggregate plan and would leave this one un-finalized
      val n = df.collect().length
      val p = df.queryExecution.executedPlan.toString
      // Exchange counts ALL non-reused exchanges (ADVICE r16: the old
      // "Exchange (?!hashpartitioning)" regex counted only non-hash ones
      // and still matched inside ReusedExchange, understating the metric
      // the round narratives track)
      val summary = s"[plandump] $full rows=$n " +
        s"ReusedExchange=${"ReusedExchange".r.findAllIn(p).length} " +
        s"Exchange=${"(?<!Reused)Exchange".r.findAllIn(p).length} " +
        s"isFinalPlan=${p.contains("isFinalPlan=true")}"
      outTemplate match {
        case Some(t) =>
          val path = java.nio.file.Paths.get(t.format(full))
          if (path.getParent != null) java.nio.file.Files.createDirectories(path.getParent)
          java.nio.file.Files.write(path,
            (s"== $full @ $sfDir ==\n\n$formatted\n\n== FINAL ADAPTIVE EXECUTED PLAN ==\n\n$p\n\n$summary\n").getBytes("UTF-8"))
          println(s"[plandump] wrote $path")
        case None =>
          println(summary)
          println(formatted)
          println(p)
      }
    }
    spark.stop()
  }
}
