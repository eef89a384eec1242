package graft.functions

import graft.SparkSpec
import graft.functions.expressions.RunOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native `max_run_count` must equal the Column formulations it
  * replaced (array_sort + aggregate fold; bigrams via transform +
  * concat_ws) — the p28 oracle was validated against those.
  */
class MaxRunCountSpec extends SparkSpec {
  import spark.implicits._

  /** ORIGINAL Column forms, kept as the reference twins. */
  private def columnMaxRun(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  private def columnBigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))

  test("hand cases: runs, bigram runs, empties, single token") {
    val df = Seq(
      (0L, Seq("a", "b", "a", "a", "c")),          // top token a×3; bigrams all unique
      (1L, Seq("x", "y", "x", "y", "x", "y")),     // bigram "x y"×3
      (2L, Seq("lone")),                           // 1 token → 0 bigrams
      (3L, Seq.empty[String]),                     // empty → 0 / 0
      (4L, Seq("t", "t", "t", "t"))                // token×4, bigram "t t"×3
    ).toDF("id", "toks")
    val out = df.select(col("id"),
      RunOps.maxRunCol(col("toks")).as("tok"),
      RunOps.maxBigramRunCol(col("toks")).as("bg"))
      .orderBy("id").collect().map(r => (r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((3, 1), (3, 3), (1, 0), (0, 0), (4, 3)))
  }

  test("native equals the Column formulations on fuzzed token arrays") {
    val docs = (0 until 300).map { i =>
      val n = i % 11
      (i.toLong, (0 until n).map(j => s"w${(i * 7 + j * j) % 5}"))
    }.toDF("id", "toks")
    val both = docs.select(
      RunOps.maxRunCol(col("toks")).as("n_tok"),
      columnMaxRun(col("toks")).as("c_tok"),
      RunOps.maxBigramRunCol(col("toks")).as("n_bg"),
      columnMaxRun(columnBigrams(col("toks"))).as("c_bg"))
    assert(both.filter(col("n_tok") =!= col("c_tok") || col("n_bg") =!= col("c_bg")).isEmpty)
  }

  test("the expression stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val p = df.select(RunOps.maxRunCol(split(col("text"), " ")).as("r"))
      .queryExecution.executedPlan.toString
    assert(p.contains("max_run_count"), p)
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p)
  }
}
