package graft.functions

import graft.SparkSpec
import graft.functions.expressions.UnicodeNorm
import org.apache.spark.sql.functions._

/** Goldens for the UnicodeNorm expression and TextOps.canonicalize —
  * the unicode behavior the ASCII test corpus cannot exercise.
  */
class UnicodeNormSpec extends SparkSpec {

  private def norm(s: String, form: String = "NFC"): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(UnicodeNorm.normCol(col("t"), form)).head().getString(0)
  }

  test("NFC composes decomposed sequences; composed input is unchanged") {
    val decomposed = "é" // e + COMBINING ACUTE ACCENT
    val composed = "é"    // é
    assert(norm(decomposed) == composed)
    assert(norm(composed) == composed)
    // the famous pair: Å (ANGSTROM SIGN U+212B) vs Å (U+00C5)
    assert(norm("Å") == "Å")
  }

  test("NFD decomposes; NFKC folds compatibility characters, NFC preserves them") {
    assert(norm("é", "NFD") == "é")
    assert(norm("ﬁ", "NFKC") == "fi")  // LATIN SMALL LIGATURE FI
    assert(norm("ﬁ", "NFC") == "ﬁ")
    assert(norm("①", "NFKC") == "1")   // CIRCLED DIGIT ONE
    assert(norm("Ｈｉ", "NFKC") == "Hi") // full-width forms
  }

  test("nulls propagate; invalid form rejected at construction") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("t")
      .select(UnicodeNorm.normCol(col("t"))).head()
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException] { UnicodeNorm.normCol(col("x"), "NFX") }
  }

  test("expression is callable from SQL after extension registration") {
    graft.plans.GraftExtensions.registerAll(spark)
    val got = spark.sql("SELECT unicode_norm('é'), unicode_norm('ﬁ', 'NFKC')").head()
    assert(got.getString(0) == "é")
    assert(got.getString(1) == "fi")
  }

  test("canonicalize collapses encoding variants of identical text to one dedup key") {
    import spark.implicits._
    val df = Seq(
      (1L, "Café  München"),   // decomposed, double space
      (2L, "café münchen"),      // composed, lowercase
      (3L, " CAFÉ MÜNCHEN \n")   // composed, uppercase, padding
    ).toDF("id", "t")
    val keys = df.select(TextOps.canonicalize(col("t")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("café münchen"))
  }
}
