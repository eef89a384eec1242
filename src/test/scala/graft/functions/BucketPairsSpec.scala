package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pins for the r16 join-free pair-generation internals:
  * [[Dedup.bucketPairs]] must reproduce the r15
  * `l.join(r, keys).filter(id_a < id_b)` self-join EXACTLY (same
  * multiset of pairs, including the multiplicity the join produced when
  * an id occurs twice under one bucket key — the 28-bit-hash collision
  * case), [[Dedup.gramSets]] must explode to exactly
  * [[Dedup.wordNgrams]], and the map-side [[Dedup.minHashSignature]]
  * must equal the r15 explode→groupBy→collect_list shape.
  */
class BucketPairsSpec extends SparkSpec {
  import spark.implicits._

  private def refSelfJoinPairs(df: org.apache.spark.sql.DataFrame) = {
    // the r15 shape this replaces, payloads riding both sides
    val l = df.select(col("k"), col("e.id").as("id_a"), col("e.p").as("p_a"))
    val r = df.select(col("k"), col("e.id").as("id_b"), col("e.p").as("p_b"))
    l.join(r, Seq("k")).filter(col("id_a") < col("id_b"))
      .select(col("k"), col("id_a"), col("p_a"), col("id_b"), col("p_b"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
  }

  test("bucketPairs == blocked self-join, payloads riding, distinct ids") {
    val rows = Seq(
      ("b1", 3L, 30L), ("b1", 1L, 10L), ("b1", 2L, 20L),
      ("b2", 5L, 50L), ("b2", 9L, 90L),
      ("b3", 7L, 70L), // singleton: no pairs
      ("b4", 11L, 1L), ("b4", 12L, 2L), ("b4", 13L, 3L), ("b4", 14L, 4L))
      .toDF("k", "id", "p")
      .select(col("k"), struct(col("id"), col("p")).as("e"))
    val got = Dedup.bucketPairs(rows, Seq("k"), col("e"))
      .select(col("k"), col("ea.id").as("id_a"), col("ea.p").as("p_a"),
        col("eb.id").as("id_b"), col("eb.p").as("p_b"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(got == refSelfJoinPairs(rows))
    // b1 alone yields C(3,2)=3 pairs, b4 C(4,2)=6, b2 1, b3 0
    assert(got.values.sum == 10)
  }

  test("bucketPairs == blocked self-join with DUPLICATE ids in a bucket (hash-collision multiplicity)") {
    // id 1 occurs twice under b1 (two grams collided to one 28-bit hash):
    // the join emits each (1, x) pair once per occurrence and never a
    // (1, 1) self-pair — multiplicity must match exactly
    val rows = Seq(
      ("b1", 1L, 10L), ("b1", 1L, 10L), ("b1", 2L, 20L), ("b1", 3L, 30L))
      .toDF("k", "id", "p")
      .select(col("k"), struct(col("id"), col("p")).as("e"))
    val got = Dedup.bucketPairs(rows, Seq("k"), col("e"))
      .select(col("k"), col("ea.id").as("id_a"), col("ea.p").as("p_a"),
        col("eb.id").as("id_b"), col("eb.p").as("p_b"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val ref = refSelfJoinPairs(rows)
    assert(got == ref)
    assert(ref(Seq("b1", 1L, 10L, 2L, 20L)) == 2) // once per duplicate occurrence
  }

  test("bucketPairs maxBucket drops over-cap buckets exactly like the hot-key anti-join") {
    val rows = (1 to 5).map(i => ("hot", i.toLong, i.toLong)) ++
      Seq(("cold", 1L, 1L), ("cold", 2L, 2L))
    val df = rows.toDF("k", "id", "p")
      .select(col("k"), struct(col("id"), col("p")).as("e"))
    val got = Dedup.bucketPairs(df, Seq("k"), col("e"), maxBucket = Some(4))
      .select(col("k")).as[String].collect()
    assert(got.toSet == Set("cold")) // hot bucket (5 > 4) fully dropped
    assert(got.length == 1)
  }

  test("gramSets explodes to exactly wordNgrams; sizes match the r15 per-doc gram counts") {
    val docs = Seq(
      (1L, "a b c d a b c d"), // repeated grams -> distinct set
      (2L, "x y"),             // shorter than n=3: single padded gram
      (3L, "  ")               // no grams at all: absent from both forms
    ).toDF("doc_id", "text")
    val viaSets = Dedup.gramSets(docs, col("doc_id"), col("text"), 3)
      .select(col("id"), explode(col("gs")).as("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val viaExplode = Dedup.wordNgrams(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaSets == viaExplode && viaSets.nonEmpty)
    assert(!viaSets.exists(_._1 == 3L))
    // per-doc counts: size(gs) == groupBy(id).count() over the exploded form
    val sizes = Dedup.gramSets(docs, col("doc_id"), col("text"), 3)
      .select(col("id"), size(col("gs")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val refSizes = Dedup.wordNgrams(docs, col("doc_id"), col("text"), 3)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(sizes == refSizes)
  }

  test("map-side minHashSignature == r15 explode -> groupBy -> collect_list shape") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
    val now = Dedup.minHashSignature(docs, col("doc_id"), col("text"), 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val r15 = Dedup.wordNgrams(docs, col("doc_id"), col("text"), 3)
      .withColumn("h", Dedup.gramHash(col("gram")))
      .groupBy("id").agg(collect_list(col("h")).as("hs"))
      .select(col("id"), graft.functions.expressions.MinHashSigs
        .minHashSigCol(col("hs"), 16).as("signature"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(now == r15)
  }
}
