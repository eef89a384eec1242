package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 45 tokens, stopword-bearing, short words → passes the default gate
  private val passing =
    ("the quick brown fox and the lazy dog run to a tree in all weather " * 3).trim
  private val passingB =
    ("a small bird sits on the old oak and sings of rain in spring dusk " * 3).trim
  private val evalText =
    ("the market opens at dawn and a crowd walks in to trade for bread " * 3).trim

  private def fixture = Seq(
    (1L, passing, "srcA"),   // survives everything
    (2L, passing, "srcA"),   // exact copy of 1 → dedup drops
    (3L, passingB, "srcA"),  // survives dedup; competes under the budget
    (4L, "too short", "srcA"),          // gate drops (2 tokens)
    (5L, evalText, "srcA"),  // copies the eval doc → decontaminated
    (90L, evalText, "srcA")  // the eval doc itself (evalFilter: id >= 90)
  ).toDF("doc_id", "text", "source")

  test("funnel attrition: gate, dedup, decontamination, budget each bite") {
    val r = Curation.curate(fixture, col("doc_id"), col("text"), col("source"),
      evalFilter = col("doc_id") >= 90, minShared = 5, budgetPerSource = 50L)
    val funnel = r.funnel.orderBy("stage_idx").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq
    assert(funnel.map(_._2) ==
      Seq("input", "quality_gate", "exact_dedup", "decontaminate", "token_budget"))
    assert(funnel.map(_._3) == Seq(5L, 4L, 3L, 2L, 1L))
    // docs never increase stage over stage (tokens likewise)
    val tokens = r.funnel.orderBy("stage_idx").collect().map(_.getLong(3)).toSeq
    assert(tokens == tokens.sorted.reverse)
  }

  test("dedup keeps the smallest id; contamination and gate drop the right docs") {
    val r = Curation.curate(fixture, col("doc_id"), col("text"), col("source"),
      evalFilter = col("doc_id") >= 90, minShared = 5, budgetPerSource = 1000L)
    val kept = r.selected.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // 2 deduped away, 4 gated, 5 decontaminated, 90 eval
  }

  test("budget: per-source cumulative token cut keeps the quality-ranked prefix") {
    val r = Curation.curate(fixture, col("doc_id"), col("text"), col("source"),
      evalFilter = col("doc_id") >= 90, minShared = 5, budgetPerSource = 50L)
    val sel = r.selected.collect()
    assert(sel.length == 1)
    assert(sel.head.getAs[Long]("cum_tokens") <= 50L)
  }
}
