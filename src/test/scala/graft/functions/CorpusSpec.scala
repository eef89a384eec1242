package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureWeights: shares sum to ~1 and weights invert the share") {
    val docs = Seq(
      (0L, "a", "one two three four five six"),   // 6 tokens
      (1L, "a", "seven eight"),                   // 2 tokens → a: 8
      (2L, "b", "nine ten"),                      // b: 2
      (3L, "c", "eleven twelve thirteen fourteen fifteen sixteen")) // c: 6
      .toDF("doc_id", "source", "text")
    val rows = Corpus.mixtureWeights(docs, col("source"), col("text"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(rows.map(_._3).toSeq == Seq(8L, 2L, 6L))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-6)
    // uniform weight = (1/3) / share: undersampled strata get weight > 1
    val bySrc = rows.map(r => r._1 -> r._5).toMap
    assert(bySrc("b") > 1.0 && bySrc("a") < 1.0)
    assert(math.abs(bySrc("a") - (1.0 / 3) / 0.5) < 1e-4)
  }

  test("topNgrams: counts, case folding, tie-break on the gram, short docs") {
    val docs = Seq(
      (0L, "big Data big data"),   // "big data"×2 (case-folded), "data big"×1
      (1L, "big data rules"),
      (2L, "solo"),                // 1 token → no bigrams
      (3L, "")                     // empty → nothing
    ).toDF("doc_id", "text")
    val rows = Corpus.topNgrams(docs, col("text"), n = 2, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("big data", 3L), ("data big", 1L), ("data rules", 1L)))
    val uni = Corpus.topNgrams(docs, col("text"), n = 1, topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(uni == Seq(("big", 3L), ("data", 3L))) // tie broken by gram asc
  }
}
