package graft.functions

import graft.SparkSpec
import graft.functions.expressions.DupGramOps
import org.apache.spark.sql.functions._

/** The native `dup_gram_count` must equal the obvious plain-Scala count
  * of n-gram positions whose gram occurs ≥ 2 times — including the
  * degenerate shapes (empty, shorter than n, all-identical).
  */
class DupGramCountSpec extends SparkSpec {
  import spark.implicits._

  private def expected(toks: Seq[String], n: Int): Int = {
    val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).view.mapValues(_.size)
    grams.count(g => counts(g) >= 2)
  }

  test("hand cases: repeats, uniques, short docs, empties") {
    val df = Seq(
      (0L, Seq("a", "b", "a", "b", "a")),   // bigrams: a b, b a, a b, b a → all 4 dup
      (1L, Seq("x", "y", "z")),             // bigrams unique → 0
      (2L, Seq("t", "t", "t", "t")),        // "t t"×3 → 3 dup positions
      (3L, Seq("lone")),                    // <2 tokens → 0
      (4L, Seq.empty[String])               // empty → 0
    ).toDF("id", "toks")
    val out = df.select(col("id"),
      DupGramOps.dupGramCountCol(col("toks"), 2).as("d2"),
      DupGramOps.dupGramCountCol(col("toks"), 3).as("d3"))
      .orderBy("id").collect().map(r => (r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((4, 2), (0, 0), (3, 2), (0, 0), (0, 0)))
  }

  test("native equals plain-Scala dup counting on fuzzed arrays, n in 1..4") {
    val docs = (0 until 300).map { i =>
      val n = i % 13
      (i.toLong, (0 until n).map(j => s"w${(i * 31 + j * j * 7) % 4}"))
    }
    val df = docs.toDF("id", "toks")
    for (n <- 1 to 4) {
      val got = df.select(col("id"), DupGramOps.dupGramCountCol(col("toks"), n))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      docs.foreach { case (id, toks) =>
        assert(got(id) == expected(toks, n), s"doc $id n=$n toks=$toks")
      }
    }
  }

  test("dupNgramStats: fractions, gram totals, and tokenless-doc drop") {
    val df = Seq(
      (0L, "a b a b a"),
      (1L, "unique words only here"),
      (2L, " \t "), // whitespace-only → dropped
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = Corpus.dupNgramStats(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L))
    val r0 = out(0)
    assert(r0.getInt(1) == 4 && r0.getDouble(2) == 1.0)  // 2-grams all dup
    assert(r0.getInt(3) == 3 && math.abs(r0.getDouble(4) - 0.6667) < 1e-9)
    val r3 = out(2)
    assert(r3.getInt(1) == 0 && r3.getDouble(2) == 0.0)  // 1 token → no grams
  }
}
