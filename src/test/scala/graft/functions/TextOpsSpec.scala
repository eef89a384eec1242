package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles edge whitespace and empty strings") {
    val df = Seq("a b c", "  a   b  ", "", "   ", "one").toDF("t")
    val counts = df.select(TextOps.tokenCount(col("t"))).collect().map(_.getInt(0)).toSeq
    assert(counts == Seq(3, 2, 0, 0, 1))
  }

  test("qualitySignals ratios are bounded and null-safe") {
    val df = Seq("The quick, brown fox!", "").toDF("t")
    val q = df.select(TextOps.qualitySignals(col("t"), TextOps.defaultStopwords).as("q"))
      .select("q.*").collect()
    val r = q.head
    assert(r.getAs[Int]("n_chars") == 21)
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Double]("punct_ratio") > 0 && r.getAs[Double]("punct_ratio") < 1)
    assert(r.getAs[Double]("stopword_ratio") == 0.25) // "the"
    val empty = q(1)
    assert(empty.getAs[Int]("n_tokens") == 0)
  }

  test("langId picks the language with most marker hits, tie-break by order") {
    val df = Seq(
      "the cat and the dog is here",  // en markers
      "el gato de la casa que canta", // es markers
      "der hund und die katze ist",   // de markers
      "xyz qqq www"                   // no markers → tie → en (first)
    ).toDF("t")
    val langs = df.select(TextOps.langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(langs == Seq("en", "es", "de", "en"))
  }

  test("langIdFromMarkerTokens (shared tokenization) agrees with langId") {
    val docs = Seq(
      "the cat and the dog is here",
      "el gato de la casa que canta",
      "der hund und die katze ist",
      "le chat est une merveille et les autres",
      "我是谁 我在哪里 的的的",          // CJK substring scoring
      "the el der le 的",               // cross-language marker soup
      "xyz qqq www", "", "   ")
    val df = docs.toDF("t")
    val direct = df.select(TextOps.langId(col("t"))).collect().map(_.getString(0)).toSeq
    val staged = df
      .select(col("t"), lower(col("t")).as("lt"))
      .select(col("lt"), TextOps.markerTokens(col("lt")).as("mtok"))
      .select(TextOps.langIdFromMarkerTokens(col("mtok"), col("lt")))
      .collect().map(_.getString(0)).toSeq
    assert(staged == direct)
  }

  test("winnowing fingerprints survive a prefix insertion (local dedup property)") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val df = Seq(base, "PREPENDED NEW CONTENT " + base).toDF("t")
    val fps = df.select(TextOps.winnowingFingerprints(col("t"), 5, 8).as("f"))
      .collect().map(_.getSeq[Long](0).toSet)
    val overlap = (fps(0) intersect fps(1)).size.toDouble / fps(0).size
    assert(overlap >= 0.5, s"overlap $overlap too low")
    // identical docs → identical fingerprint sets
    val same = Seq(base, base).toDF("t")
      .select(TextOps.winnowingFingerprints(col("t"), 5, 8).as("f"))
      .collect().map(_.getSeq[Long](0))
    assert(same(0) == same(1))
  }

  test("fingerprint collapses case and whitespace") {
    val df = Seq(("A  b\tC", "a b c")).toDF("x", "y")
    val r = df.select(TextOps.fingerprint(col("x")).as("fx"),
      TextOps.fingerprint(col("y")).as("fy")).head()
    assert(r.getString(0) == r.getString(1))
  }

  test("dropRepeatedLines keeps first occurrences in order; unique docs unchanged") {
    val df = Seq(
      "nav\nbody one\nnav\nbody two\nnav",
      "a\nb\nc",
      "same\nsame\nsame").toDF("t")
    val got = df.select(TextOps.dropRepeatedLines(col("t"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("nav\nbody one\nbody two", "a\nb\nc", "same"))
  }
}
