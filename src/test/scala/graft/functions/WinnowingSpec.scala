package graft.functions

import graft.SparkSpec
import graft.functions.expressions.Winnowing
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: hash every k-gram directly, min over every length-w
    * window, distinct sorted — the semantics the O(n) pass must match.
    */
  private def naive(s: String, k: Int, w: Int): Seq[Long] = {
    val grams = if (s.length < k) Seq.empty else s.sliding(k).toSeq
    val hashes = grams.map(_.foldLeft(0L)((h, c) => (h * Winnowing.Base + c) % Winnowing.Mod))
    val mins =
      if (hashes.isEmpty) Seq.empty[Long]
      else if (hashes.length <= w) Seq(hashes.min)
      else hashes.sliding(w).map(_.min).toSeq
    mins.distinct.sorted
  }

  private def viaSpark(texts: Seq[String], k: Int, w: Int): Seq[Seq[Long]] =
    texts.toDF("t").select(TextOps.winnowingFingerprints(col("t"), k, w).as("f"))
      .collect().map(_.getSeq[Long](0)).toSeq

  test("matches the naive reference on varied strings, k/w combinations") {
    val rng = new scala.util.Random(42)
    val texts = Seq(
      "", "a", "abcd", "abcde", "abcdef",       // below/at/above k=5
      "aaaaaaaaaaaaaaaa",                        // constant (all hashes equal)
      "the quick brown fox jumps over the lazy dog"
    ) ++ (1 to 20).map(_ => rng.alphanumeric.take(1 + rng.nextInt(120)).mkString)
    for ((k, w) <- Seq((5, 8), (3, 4), (1, 1), (7, 2))) {
      val got = viaSpark(texts, k, w)
      val want = texts.map(naive(_, k, w))
      assert(got == want, s"mismatch at k=$k w=$w")
    }
  }

  test("short text below k yields no fingerprints; fewer grams than w yields the global min") {
    assert(viaSpark(Seq("abc"), 5, 8) == Seq(Seq.empty))
    val one = viaSpark(Seq("abcdefg"), 5, 8).head // 3 grams < w=8
    assert(one.length == 1)
    assert(one == naive("abcdefg", 5, 8))
  }

  test("hash residues stay within [0, 2^31) for BIGINT-safe oracles") {
    val fps = viaSpark(Seq("zzzzzzzzzzzzzzzzzzzz~~~~~"), 5, 8).head
    assert(fps.forall(h => h >= 0 && h < (1L << 31)))
  }
}
