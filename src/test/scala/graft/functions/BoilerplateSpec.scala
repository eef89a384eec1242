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
}
