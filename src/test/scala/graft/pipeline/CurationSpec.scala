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

  test("mixtureBuild: stage accounting, budget ceiling, cross-stratum dedup") {
    import spark.implicits._
    // stratum A: 30 docs of 10 tokens (one is a dup pair), one 3-token
    // short doc; stratum B: 5 docs of 10 tokens, incl. a cross-stratum
    // dup of A's doc 0 (removed: A's id is smaller)
    val mk = (i: Long, n: Int, s0: String) =>
      (i, (0 until n).map(j => s"w${i}_$j").mkString(" "), s0)
    val rows = (0L until 30L).map(i => mk(i, 10, "A")) ++
      Seq((30L, (0 until 10).map(j => s"w0_$j").mkString(" "), "A"),   // dup of doc 0
        (31L, "a b c", "A")) ++                                         // gated out
      (40L until 44L).map(i => mk(i, 10, "B")) ++
      Seq((44L, (0 until 10).map(j => s"w0_$j").mkString(" "), "B"))   // cross-stratum dup
    val out = graft.pipeline.Curation.mixtureBuild(
        rows.toDF("doc_id", "text", "src"),
        col("doc_id"), col("text"), col("src"),
        minTokens = 5, budgetNum = 1L, budgetDen = 2L)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(7))).toSeq
    // A: 32 in, 31 gated (short doc out), 30 after dedup (intra dup out)
    // B: 5 in, 5 gated, 4 after dedup (cross-stratum dup collapses to A)
    val a = out.head; val b = out(1)
    assert(a == (("A", 32L, 31L, 30L, 300L, a._6, a._7)))
    assert(b == (("B", 5L, 5L, 4L, 40L, b._6, b._7)))
    // waterfill: total 340, budget 170; B (40) uncapped, A capped at 130
    assert(a._6 == 130L && b._6 == 40L)
    // selection never exceeds the allocation; B takes everything
    assert(a._7 <= 130L && b._7 == 40L)
  }

  test("deleteCascade: group survival, shard rewrite set, token mass — exact") {
    import spark.implicits._
    // docs 1/2 share a fingerprint (dup pair); 3 and 4 are unique.
    // delete {2, 4}: the 1/2 group SURVIVES (member 1 remains), doc 4's
    // group disappears entirely
    val docs = Seq(
      (1L, "same text"), (2L, "same  TEXT "), // fingerprint-equal
      (3L, "alpha beta gamma"), (4L, "delta")).toDF("doc_id", "text")
    val rows = graft.pipeline.Curation.deleteCascade(docs, col("doc_id"),
        col("text"), col("doc_id").isin(2L, 4L), shards = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("documents") == ((4L, 2L, 2L)))
    assert(rows("fingerprint_store") == ((3L, 1L, 2L)))
    // token mass: 2+2+3+1 = 8; deleted 2 (doc 2) + 1 (doc 4) = 3
    assert(rows("token_mass") == ((8L, 3L, 5L)))
    // shards: manifests exist per OCCUPIED shard (4 docs → ≤ 4 of the 8);
    // the count survives the rewrite; touched is bounded by the delete size
    val (sb, sa, sf) = rows("shard_manifests")
    assert(sb >= 1L && sb <= 4L && sf == sb && sa >= 1L && sa <= 2L)
  }

  test("preferencePairs: extremes zip by rank, near-ties drop, ids never collide") {
    import spark.implicits._
    // one source, stopword ratios (ppm): doc1 500000, doc2 500000 (tie →
    // id order), doc3 250000, doc4 0. k=2:
    //   chosen  rank1=doc1(500000) rank2=doc2(500000)
    //   rejected rank1=doc4(0)     rank2=doc3(250000)
    // margins: 500000, 250000 — both clear 100000
    val docs = Seq(
      (1L, "A", "the of x y"),     // 2 stop / 4 → 500000
      (2L, "A", "and to p q"),     // 500000
      (3L, "A", "the w x y"),      // 1/4 → 250000
      (4L, "A", "w x y z")).toDF("doc_id", "source", "text")
    val rows = graft.pipeline.Curation.preferencePairs(docs, col("doc_id"),
        col("text"), col("source"), k = 2, minMarginPpm = 100000L)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4),
        r.getLong(6))).toSeq
    assert(rows == Seq((1, 1L, 4L, 500000L), (2, 2L, 3L, 250000L)))
    // raise the margin: the 250000 pair drops
    val strict = graft.pipeline.Curation.preferencePairs(docs, col("doc_id"),
        col("text"), col("source"), k = 2, minMarginPpm = 300000L)
      .collect().map(r => (r.getLong(2), r.getLong(4))).toSeq
    assert(strict == Seq((1L, 4L)))
  }
}
