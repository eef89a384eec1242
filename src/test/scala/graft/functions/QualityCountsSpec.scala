package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityCountsSpec extends SparkSpec {
  import spark.implicits._

  /** The column-expression formulation the native expression replaced —
    * kept here as the semantic reference.
    */
  private def reference(text: org.apache.spark.sql.Column, stopwords: Seq[String]) = {
    val nChars = length(text)
    val nTok = TextOps.tokenCount(text)
    struct(
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      (nChars - length(regexp_replace(text, "[\\p{Punct}]", ""))).as("n_punct"),
      (nChars - length(regexp_replace(text, "[A-Z]", ""))).as("n_upper"),
      TextOps.tokenHits(text, stopwords).as("n_stop"))
  }

  test("matches the regex/HOF formulation on varied and random strings") {
    val rng = new scala.util.Random(5)
    val chars = "abc XYZ.,;!? \t\n()[]{}the and of is" // incl. stopword material
    val texts = Seq("", " ", "the", "THE The the.", "a!b@c#d", "  spaced   out  ",
      "The quick, brown fox; jumps over THE lazy dog!") ++
      (1 to 30).map(_ => (1 to (1 + rng.nextInt(150))).map(_ => chars(rng.nextInt(chars.length))).mkString)
    val df = texts.toDF("t")
    val got = df.select(
        graft.functions.expressions.QualityCounts.qualityCountsCol(col("t"), TextOps.defaultStopwords).as("q"))
      .selectExpr("q.*").collect().map(_.toSeq).toSeq
    val want = df.select(reference(col("t"), TextOps.defaultStopwords).as("q"))
      .selectExpr("q.*").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("expression stays in whole-stage codegen") {
    // a literal input constant-folds to LocalTableScan; use a real source
    val df = spark.range(10).select(concat(lit("tok "), col("id")).as("t"))
      .select(graft.functions.expressions.QualityCounts.qualityCountsCol(col("t"), Seq("the")).as("q"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.selectExpr("q.n_tokens").head().getInt(0) == 2)
  }
}
