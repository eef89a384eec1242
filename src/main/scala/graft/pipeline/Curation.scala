package graft.pipeline

import graft.functions.{Quality, Sampling, TextOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The selected corpus plus the per-stage attrition funnel
  * `(stage_idx, stage, n_docs, n_tokens)`.
  */
final case class CurationResult(selected: DataFrame, funnel: DataFrame)

/** End-to-end corpus curation: the standard training-data preparation
  * chain — quality gate → exact dedup → eval-set decontamination →
  * per-source token-budget selection — composed from the engine's
  * operators into ONE declarative DataFrame DAG, with an attrition
  * funnel for pipeline observability.
  *
  * Every stage keeps its operator's scale shape: the gate is a pushable
  * map-side predicate; dedup is one fingerprint-keyed window (first
  * occurrence survives); decontamination broadcasts the eval fingerprint
  * set (eval benchmarks are broadcast-sized by definition) and
  * anti-joins; selection is one stratum-keyed window. Document text
  * itself crosses the wire only for the dedup and selection shuffles —
  * at 100 TB both key on high-cardinality columns (content hash,
  * source), so AQE spreads them.
  *
  * The funnel unions one scalar aggregate per stage; branches share the
  * lineage prefix (cache the gated stage when running both outputs on a
  * real cluster).
  */
object Curation {

  def curate(docs: DataFrame, id: Column, text: Column, source: Column,
             evalFilter: Column, minShared: Int, budgetPerSource: Long,
             rules: Quality.GateRules = Quality.GateRules(),
             stopwords: Seq[String] = TextOps.defaultStopwords): CurationResult = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val base = docs.select(id.as("doc_id"), text.as("text"), source.as("source"),
      evalFilter.as("is_eval"))
    val train = base.filter(!col("is_eval"))
    val evalDocs = base.filter(col("is_eval"))

    val gated = train.filter(
      Quality.gate(col("text"), stopwords, rules).getField("passes"))

    // exact dedup: first occurrence (smallest id) per content fingerprint
    val byFp = Window.partitionBy("fp").orderBy("doc_id")
    val deduped = gated
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("rn", row_number().over(byFp))
      .filter(col("rn") === 1).drop("fp", "rn")

    // decontamination: substring-level winnowing overlap vs the eval set
    val evalFps = evalDocs
      .select(explode(TextOps.winnowingFingerprints(col("text"), k = 5, w = 8)).as("fp"))
      .distinct()
    val contaminated = deduped
      .select(col("doc_id"),
        explode(TextOps.winnowingFingerprints(col("text"), k = 5, w = 8)).as("fp"))
      .join(broadcast(evalFps), Seq("fp"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")

    val selected = Sampling.tokenBudgetSelect(clean, col("doc_id"), col("source"),
      TextOps.tokenCount(col("text")),
      TextOps.qualitySignals(col("text"), stopwords).getField("stopword_ratio"),
      budgetPerSource)

    def stageRow(idx: Int, name: String, df: DataFrame, tokens: Column): DataFrame =
      df.agg(count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum(tokens), lit(0L)).cast("long").as("n_tokens"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))

    val tok = TextOps.tokenCount(col("text"))
    val funnel = stageRow(0, "input", train, tok)
      .unionByName(stageRow(1, "quality_gate", gated, tok))
      .unionByName(stageRow(2, "exact_dedup", deduped, tok))
      .unionByName(stageRow(3, "decontaminate", clean, tok))
      .unionByName(stageRow(4, "token_budget", selected, col("n_tokens")))
    CurationResult(selected, funnel)
  }
}
