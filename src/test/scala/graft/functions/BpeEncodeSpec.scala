package graft.functions

import graft.SparkSpec
import graft.functions.expressions.BpeEncode
import org.apache.spark.sql.functions._

/** Hand-computed goldens for the BPE encoder — the correctness gate for
  * p109, which has no SQL oracle (greedy iterative merging is not
  * SQL-expressible).
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(text).toDF("t").select(BpeEncode.encodeCol(col("t"), merges))
      .head().getSeq[String](0)

  test("iterative merging: learned pieces compose across ranks") {
    // low: l o w -> lo w -> low; lower: l o w e r -> lo w e r -> low e r
    assert(enc("low lower", Seq(("l", "o"), ("lo", "w"))) ==
      Seq("low", "low", "e", "r"))
  }

  test("lowest rank wins over textual order") {
    // (b,c) is rank 0, so abc -> a bc (not ab c)
    assert(enc("abc", Seq(("b", "c"), ("a", "b"))) == Seq("a", "bc"))
  }

  test("non-overlapping left-to-right merging") {
    assert(enc("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(enc("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
  }

  test("whitespace pre-tokenization and supplementary codepoints") {
    assert(enc("  a  b ", Seq(("x", "y"))) == Seq("a", "b"))
    assert(enc("😀😀", Seq(("😀", "😀"))) == Seq("😀😀"))
  }

  test("words with no applicable merges fall back to codepoints") {
    assert(enc("zq", Seq(("a", "b"))) == Seq("z", "q"))
  }
}
