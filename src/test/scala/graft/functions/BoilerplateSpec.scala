package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs share a header and footer; bodies are unique; doc 5 is pure
  // boilerplate; doc 4 repeats the header inside its body
  private def docs = Seq(
    (0L, "HEADER\nalpha beta\nFOOTER"),
    (1L, "HEADER\ngamma delta\nFOOTER"),
    (2L, "HEADER\nepsilon\nFOOTER"),
    (3L, "HEADER\nzeta eta\nFOOTER"),
    (4L, "HEADER\nHEADER\ntheta\nFOOTER"),
    (5L, "HEADER\nFOOTER")
  ).toDF("doc_id", "text")

  test("frequentLines counts one vote per document") {
    val freq = Boilerplate.frequentLines(docs, col("text"), minDf = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc 4's repeated HEADER must not double-count: df is 6, not 7
    assert(freq == Map("HEADER" -> 6L, "FOOTER" -> 6L))
  }

  test("removeFrequentLines strips boilerplate, keeps order, counts lines") {
    val out = Boilerplate.removeFrequentLines(docs, col("doc_id"), col("text"), minDf = 6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(out == Seq(
      (0L, "alpha beta", 1, 2),
      (1L, "gamma delta", 1, 2),
      (2L, "epsilon", 1, 2),
      (3L, "zeta eta", 1, 2),
      (4L, "theta", 1, 3), // both HEADER occurrences removed
      (5L, "", 0, 2)       // all-boilerplate doc survives with empty text
    ))
  }

  test("below-threshold lines are untouched") {
    val out = Boilerplate.removeFrequentLines(docs, col("doc_id"), col("text"), minDf = 7)
      .agg(sum("n_dropped")).collect()(0).getLong(0)
    assert(out == 0L)
  }

  test("prefixShare finds the dominant template prefix per source; short docs sit aside") {
    import spark.implicits._
    val tpl = "welcome to acme corp the best site ever" // 8 tokens
    val rows =
      (1 to 7).map(i => (i.toLong, s"$tpl unique tail $i", "acme")) ++
        Seq((8L, "organic document with eight distinct tokens right here", "acme"),
          (9L, "too short", "acme"), // < 8 tokens: no prefix
          (10L, "a b c d e f g h", "clean"),
          (11L, "z y x w v u t s", "clean"))
    val got = Boilerplate.prefixShare(rows.toDF("doc_id", "text", "source"),
        col("doc_id"), col("text"), col("source"), k = 8)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // acme: 8 docs form a prefix (7 template + 1 organic), 1 short;
    // template share = 7/8 = 875 permille
    assert(got.head == (("acme", tpl, 7L, 8L, 1L, 875L)))
    // clean: two distinct prefixes tie at 1 — the lexicographically
    // larger wins (the documented deterministic tie-break), share 500
    val clean = got(1)
    assert(clean._1 == "clean" && clean._2 == "z y x w v u t s" &&
      clean._3 == 1L && clean._6 == 500L)
  }
}
