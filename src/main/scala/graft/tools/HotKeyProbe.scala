package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the r17 hot-key window fix (verdict ask #2): builds a
  * synthetic corpus where ONE boilerplate 8-gram occurs in every
  * document (hottest h = nDocs ≥ 1e5 occurrence rows) and times
  * duplicateSpans' duplicated-position marking in both shapes:
  *
  *   - window: `count(*) over (partition by h)` — every occurrence of
  *     the hot gram lands in ONE window partition, no map-side combine,
  *     not AQE-splittable;
  *   - aggregate: partial-combined `groupBy(h).count` + semi-join back
  *     (the shipped r17 shape).
  *
  * Usage: runMain graft.tools.HotKeyProbe [nDocs] [cpus]
  */
object HotKeyProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(150000)
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // every doc: the SAME 8-token boilerplate sentence + a SHORT unique
    // tail (11 tokens → 4 grams/doc, 2 of them corpus-hot) so the hot
    // key owns ~half of all occurrence rows — the straggler regime
    val docs = spark.range(nDocs.toLong).select(col("id").as("doc_id"),
      concat(lit("terms of service apply to all content here "),
        lit("unique "), col("id").cast("string"),
        lit(" f"), col("id").cast("string"))
        .as("text")).localCheckpoint(true)

    val k = 8
    val base = docs
      .select(col("doc_id"), graft.functions.TextOps.tokens(lower(col("text"))).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("n_tokens"), col("ts"))
    val occ = base.filter(col("n_tokens") >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_tokens") - k),
          i => xxhash64(concat_ws(" ", slice(col("ts"), i + 1, lit(k))))))
          .as(Seq("pos", "h")))
      .localCheckpoint(true)
    val hot = occ.groupBy("h").count().orderBy(desc("count")).head()
    println(s"[hotkey] nDocs=$nDocs occ=${occ.count()} hottest h count=${hot.getLong(1)}")

    def time(label: String)(df: DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[hotkey] $label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    // window form (the r16 shape)
    val windowMarked = occ
      .withColumn("cnt", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("cnt") >= 2).drop("cnt")
    time("window-mark")(windowMarked)

    // aggregate + semi-join form (the r17 shape)
    val dupH = occ.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("h")
    val aggMarked = occ.hint("merge").join(dupH.hint("merge"), Seq("h"), "left_semi")
    time("agg-semijoin-mark")(aggMarked)
    // drive THIS dataframe's own execution so the finalized adaptive
    // plan (with any skew-split AQEShuffleRead) is inspectable
    aggMarked.queryExecution.toRdd.foreachPartition(_ => ())
    println("[hotkey] agg skew-split: " +
      aggMarked.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("AQEShuffleRead")).map(_.trim).mkString(" | "))

    // same, with the skew thresholds a skewed production corpus would
    // tune (the default 256 MB threshold is above this probe's hot
    // partition) — the window form has no analogous knob at any setting
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    val aggMarked2 = occ.hint("merge").join(dupH.hint("merge"), Seq("h"), "left_semi")
    time("agg-semijoin-mark-skewtuned")(aggMarked2)
    aggMarked2.queryExecution.toRdd.foreachPartition(_ => ())
    println("[hotkey] tuned skew-split: " +
      aggMarked2.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("AQEShuffleRead")).map(_.trim).mkString(" | "))
    // dup side CHECKPOINTED: OptimizeSkewedJoin only matches
    // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an aggregate between
    // the right sort and its shuffle blocks the split; a materialized
    // dup set makes both sides bare shuffle reads
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    val dupHC = dupH.localCheckpoint(true)
    val aggMarked3 = occ.hint("merge").join(dupHC.hint("merge"), Seq("h"), "left_semi")
    time("agg-semijoin-ckpt-skewtuned")(aggMarked3)
    aggMarked3.queryExecution.toRdd.foreachPartition(_ => ())
    println("[hotkey] ckpt skew-split: " +
      aggMarked3.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("AQEShuffleRead")).map(_.trim).mkString(" | "))
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    println(s"[hotkey] rows window=${windowMarked.count()} agg=${aggMarked.count()} tuned=${aggMarked2.count()}")
    spark.stop()
  }
}
