package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // target rows: "alpha beta" heavy
    (0L, "alpha beta alpha beta alpha beta", true),
    (1L, "alpha beta gamma", true),
    // raw-only rows: "noise junk" heavy
    (2L, "noise junk noise junk noise junk", false),
    (3L, "noise junk spam", false),
    // mixed row and a 1-token row (no bigrams → excluded)
    (4L, "alpha beta noise junk", false),
    (5L, "solo", false)
  ).toDF("doc_id", "text", "is_t")

  test("bigrams: adjacent lowercased token pairs; <2 tokens yields empty") {
    val out = Seq((0L, "The Cat  sat"), (1L, "one"), (2L, " "))
      .toDF("id", "t")
      .select(col("id"), Importance.bigrams(col("t")).as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(out(0L) == Seq("the cat", "cat sat"))
    assert(out(1L).isEmpty)
    assert(out(2L).isEmpty)
  }

  test("featureBucket is stable, non-negative, and within range") {
    val bs = Seq("alpha beta", "noise junk", "alpha beta").toDF("g")
      .select(Importance.featureBucket(col("g"), 64).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(bs(0) == bs(2)) // same gram → same bucket
    assert(bs.forall(b => b >= 0 && b < 64))
  }

  test("dsirWeights ranks target-like documents above raw-only ones") {
    val w = Importance.dsirWeights(docs, col("doc_id"), col("text"),
        col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!w.contains(5L)) // no bigrams → no weight
    // target-heavy docs score above the raw-only spam docs
    assert(w(0L) > w(2L), w.toString)
    assert(w(1L) > w(3L), w.toString)
    // the mixed doc sits between the pure-target and pure-noise ones
    assert(w(4L) < w(0L) && w(4L) > w(2L), w.toString)
  }

  test("dsirWeights is invariant under repartitioning (order-independent sums)") {
    val a = Importance.dsirWeights(docs, col("doc_id"), col("text"), col("is_t"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Importance.dsirWeights(docs.repartition(7), col("doc_id"), col("text"), col("is_t"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
