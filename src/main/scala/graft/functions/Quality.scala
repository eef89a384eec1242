package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composite document-quality gating: the rule-based corpus filter every
  * large-scale text pipeline runs before dedup/selection (the pattern
  * popularized by Gopher's quality heuristics and C4's cleanup rules —
  * length bounds, mean-word-length bounds, symbol ratios, stopword
  * presence).
  *
  * Entirely map-side: one [[TextOps.qualitySignals]] pass (a single
  * native char-scan expression) fans out into per-rule booleans and a
  * conjunction, all inside the same whole-stage-codegen stage. No
  * shuffle, no UDF — at 100 TB the gate is a free rider on whatever scan
  * feeds it, and Catalyst pushes a `passes`-filter straight onto the
  * parquet scan's generated predicate.
  */
object Quality {

  /** Per-rule thresholds for [[gate]]. Defaults follow the published
    * heuristics (word-count window, mean-word-length window, symbol and
    * case ceilings, a stopword floor) scaled to this corpus.
    */
  final case class GateRules(
      minTokens: Int = 30,
      maxTokens: Int = 80,
      minMeanTokenLen: Double = 3.0,
      maxMeanTokenLen: Double = 6.0,
      minStopwordRatio: Double = 0.03,
      maxPunctRatio: Double = 0.1,
      maxUpperRatio: Double = 0.3)

  /** Rule flags + conjunction over a [[TextOps.qualitySignals]] struct.
    * Thresholds compare against the signals' 4-dp-rounded ratios, so the
    * decision is reproducible across engines (raw last-ulp ratios are
    * not). Returns a struct `(r_len, r_wordlen, r_stop, r_punct, r_upper,
    * passes)`.
    */
  def gateFlags(q: Column, rules: GateRules = GateRules()): Column = {
    val rLen = q.getField("n_tokens").between(rules.minTokens, rules.maxTokens)
    val rWordLen = q.getField("mean_token_len")
      .between(rules.minMeanTokenLen, rules.maxMeanTokenLen)
    val rStop = q.getField("stopword_ratio") >= rules.minStopwordRatio
    val rPunct = q.getField("punct_ratio") <= rules.maxPunctRatio
    val rUpper = q.getField("upper_ratio") <= rules.maxUpperRatio
    struct(
      rLen.as("r_len"),
      rWordLen.as("r_wordlen"),
      rStop.as("r_stop"),
      rPunct.as("r_punct"),
      rUpper.as("r_upper"),
      (rLen && rWordLen && rStop && rPunct && rUpper).as("passes"))
  }

  /** One-call form: signals + flags from the raw text column. */
  def gate(text: Column, stopwords: Seq[String] = TextOps.defaultStopwords,
           rules: GateRules = GateRules()): Column =
    gateFlags(TextOps.qualitySignals(text, stopwords), rules)
}
