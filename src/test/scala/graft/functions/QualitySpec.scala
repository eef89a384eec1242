package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val okDoc = // 30+ tokens, mixed, stopword-bearing, lowercase
    (("the quick brown fox jumps over a lazy dog and then " * 3) + "rests now").trim

  test("gate: passing doc passes every rule; rule violations flip exactly their flag") {
    val df = Seq(
      (0L, okDoc),                                   // passes
      (1L, "too short to pass"),                     // r_len fails (4 tokens)
      (2L, ("supercalifragilistic expialidocious extraordinarily " * 12).trim), // r_wordlen + r_stop fail
      (3L, ("dog cat bird fish cow hen pig fox owl bee " * 4).trim)             // r_stop fails (no stopwords)
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Quality.gate(col("text")).as("g"))
      .select(col("doc_id"), col("g.*")).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(byId(0L) == ((true, true, true, true, true, true)))
    assert(!byId(1L)._1 && !byId(1L)._6)             // length rule + conjunction fail
    assert(!byId(2L)._2 && !byId(2L)._6)             // mean-word-length rule fails
    assert(byId(3L)._1 && !byId(3L)._3 && !byId(3L)._6) // only stopword rule fails
  }

  test("passes is exactly the conjunction of the five rule flags") {
    val df = (0 until 200).map { i =>
      val words = (0 until (i % 100)).map(j => if (j % 7 == 0) "the" else s"w${j % 9}x")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val bad = df.select(Quality.gate(col("text")).as("g"))
      .filter(col("g.passes") =!= (col("g.r_len") && col("g.r_wordlen") &&
        col("g.r_stop") && col("g.r_punct") && col("g.r_upper")))
      .count()
    assert(bad == 0L)
  }

  test("thresholds compare the ROUNDED ratios (boundary doc is stable)") {
    // 100 chars of which exactly 10 punct → punct_ratio 0.1 == max bound: passes
    val boundary = ("ab cd ef gh ij " * 6).trim + " !!!!!!!!!!" // tune: punct adds to chars
    val r = Seq((0L, boundary)).toDF("doc_id", "text")
      .select(Quality.gate(col("text")).getField("r_punct")).head().getBoolean(0)
    val ratio = Seq((0L, boundary)).toDF("doc_id", "text")
      .select(TextOps.qualitySignals(col("text"), TextOps.defaultStopwords)
        .getField("punct_ratio")).head().getDouble(0)
    assert(r == (ratio <= 0.1)) // flag agrees with the rounded ratio it gates on
  }

  test("quantileNormalize maps shifted sources onto one global distribution") {
    import spark.implicits._
    // A scores 1..10, B scores 101..110: after normalization both
    // sources hit the same within-source permilles, hence the SAME
    // global quantile values — batch effect removed
    val rows = (1 to 10).map(i => (i.toLong, "A", i.toLong)) ++
      (1 to 10).map(i => (100L + i, "B", 100L + i))
    val out = Quality.quantileNormalize(rows.toDF("doc_id", "src", "sc"),
        col("doc_id"), col("src"), col("sc"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val a = out.head; val b = out(1)
    assert(a._1 == "A" && b._1 == "B" && a._2 == 10L && b._2 == 10L)
    assert((a._3, a._4, a._5, a._6) == ((b._3, b._4, b._5, b._6)),
      s"normalized summaries must match: $a vs $b")
    // the normalized values straddle BOTH source ranges (global mapping,
    // not a per-source rescale): min from A's range, max from B's
    assert(a._4 <= 10L && a._6 >= 101L)
  }

  test("madOutlierGate: exact integer median/MAD; robust to the planted whale") {
    import spark.implicits._
    // source A: values 10,10,11,12,13 + a 100000-token whale.
    // n=6 → lower-median rank 3: sorted (10,10,11,12,13,100000) → med=11;
    // devs (1,1,0,1,2,99989) sorted (0,1,1,1,2,99989) → MAD=1;
    // outliers (dev > 3): only the whale. A mean/stddev gate would let
    // the whale inflate sigma past its own deviation.
    val docs = Seq(10, 10, 11, 12, 13, 100000).zipWithIndex
      .map { case (v, i) => (i.toLong, "A", ("w " * v).trim) }
      .toDF("doc_id", "source", "text")
    val r = Quality.madOutlierGate(docs, col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(
          TextOps.tokens(lower(col("text")))), k = 3)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).head
    assert(r == (("A", 6L, 11L, 1L, 1L, 166666L)))
  }

  test("raterAgreement: hand-computed kappa, perfect agreement, worse-than-chance sign") {
    // 10 docs, 2 labels; A = (6×0, 4×1), B agrees on 8:
    //   cells (0,0)=5 (0,1)=1 (1,0)=1 (1,1)=3 → po = 0.8
    //   marginals A(0)=6 A(1)=4, B(0)=6 B(1)=4 → pe = (36+16)/100 = 0.52
    //   kappa = 0.28/0.48 = 0.583333… → 583333 ppm (floor)
    val ab = Seq((0, 0), (0, 0), (0, 0), (0, 0), (0, 0), (0, 1),
      (1, 0), (1, 1), (1, 1), (1, 1)).toDF("a", "b")
    val got = Quality.raterAgreement(ab, col("a"), col("b"))
      .orderBy("label_a", "label_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (0L, 0L, 5L, 10L, 800000L, 520000L, 583333L),
      (0L, 1L, 1L, 10L, 800000L, 520000L, 583333L),
      (1L, 0L, 1L, 10L, 800000L, 520000L, 583333L),
      (1L, 1L, 3L, 10L, 800000L, 520000L, 583333L)))
    // perfect agreement: kappa = 1e6 exactly
    val perfect = Seq((0, 0), (1, 1), (2, 2)).toDF("a", "b")
    assert(Quality.raterAgreement(perfect, col("a"), col("b"))
      .head().getLong(6) == 1000000L)
    // worse than chance (systematic disagreement): kappa strictly negative,
    // truncated toward zero identically to the oracle's CASE arithmetic
    // po = 0, pe = 0.5 → kappa = -0.5/0.5 = -1000000 ppm
    val anti = Seq((0, 1), (0, 1), (1, 0), (1, 0)).toDF("a", "b")
    assert(Quality.raterAgreement(anti, col("a"), col("b"))
      .head().getLong(6) == -1000000L)
    // constant single label on both sides: pe = 1e6, kappa defined as 0
    val const = Seq((1, 1), (1, 1)).toDF("a", "b")
    assert(Quality.raterAgreement(const, col("a"), col("b"))
      .head().getLong(6) == 0L)
  }

  test("madOutlierGate MAD=0 degenerate case flags every deviation (documented)") {
    import spark.implicits._
    val docs = Seq(5, 5, 5, 5, 9).zipWithIndex
      .map { case (v, i) => (i.toLong, "B", ("w " * v).trim) }
      .toDF("doc_id", "source", "text")
    val r = Quality.madOutlierGate(docs, col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(
          TextOps.tokens(lower(col("text")))), k = 3)
      .collect().map(x => (x.getLong(2), x.getLong(3), x.getLong(4))).head
    assert(r == ((5L, 0L, 1L))) // med=5, MAD=0, the single deviant flagged
  }
}
