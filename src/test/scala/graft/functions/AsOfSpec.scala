package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // key 1: rights at t=10, 20; key 2: right only at t=100; key 3: none
  private val right = Seq(
    (1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 100L, "r100")
  ).toDF("k", "ts", "tag")

  private val left = Seq(
    (1L, 5L, "before-any"), (1L, 10L, "at-first"), (1L, 15L, "between"),
    (1L, 25L, "after-both"), (2L, 99L, "just-before"), (3L, 50L, "no-rights")
  ).toDF("k", "ts", "what")

  test("asofJoin attaches the latest right row at-or-before each left ts") {
    val out = AsOf.asofJoin(left, right, "k", "ts")
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, 5L, "before-any", None),          // nothing yet → null
      (1L, 10L, "at-first", Some("r10")),    // equal ts is INCLUSIVE
      (1L, 15L, "between", Some("r10")),
      (1L, 25L, "after-both", Some("r20")),  // latest, not first
      (2L, 99L, "just-before", None),        // right exists but later
      (3L, 50L, "no-rights", None)))         // key absent on the right
  }

  test("result is partitioning-independent and keeps every left row") {
    val bigL = (0L until 300L).map(i => (i % 7, i, s"l$i")).toDF("k", "ts", "what")
    val bigR = (0L until 100L).map(i => (i % 7, i * 3, s"r$i")).toDF("k", "ts", "tag")
    def run(parts: Int) =
      AsOf.asofJoin(bigL.repartition(parts), bigR.repartition(parts), "k", "ts")
        .orderBy("k", "ts").collect().toSeq
    assert(run(1) == run(13))
    assert(run(1).size == 300)
  }

  test("multiple right value columns all come through with the prefix") {
    val r2 = Seq((1L, 10L, "x", 1.5)).toDF("k", "ts", "tag", "score")
    val out = AsOf.asofJoin(Seq((1L, 11L, "go")).toDF("k", "ts", "what"), r2, "k", "ts")
    assert(out.columns.toSeq == Seq("k", "ts", "what", "asof_tag", "asof_score"))
    val row = out.collect().head
    assert(row.getString(3) == "x" && row.getDouble(4) == 1.5)
  }

  test("PROPERTY: matches the naive per-key latest-at-or-before scan on random inputs") {
    val rng = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      // random keys, clustered timestamps (plenty of < = > collisions);
      // right (k, ts) kept unique — the operator's documented contract
      val leftRows = (0 until 120).map { i =>
        (rng.nextInt(5).toLong, rng.nextInt(40).toLong, s"l$trial-$i")
      }
      val rightRows = rng.shuffle((0 until 60).map { i =>
        (rng.nextInt(6).toLong, rng.nextInt(40).toLong, s"r$trial-$i")
      }).distinctBy(r => (r._1, r._2))
      val got = AsOf.asofJoin(
          leftRows.toDF("k", "ts", "what").repartition(7),
          rightRows.toDF("k", "ts", "tag").repartition(3), "k", "ts")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3))))
        .sortBy(t => (t._1, t._2, t._3))
      val byKey = rightRows.groupBy(_._1)
      val want = leftRows.map { case (k, ts, what) =>
        val best = byKey.getOrElse(k, Seq.empty).filter(_._2 <= ts)
          .sortBy(_._2).lastOption.map(_._3)
        (k, ts, what, best)
      }.sortBy(t => (t._1, t._2, t._3))
      assert(got.toSeq == want, s"trial $trial diverged from the naive reference")
    }
  }

  // --- intervalOverlap ---

  private def iv(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("k", "id", "start_s", "end_s")

  test("intervalOverlap finds exactly the strictly-overlapping same-key pairs") {
    // a1 [0,100] overlaps b1 [50,150] by 50; touches b2 [100,200] at a
    // point (overlap 0 → excluded); disjoint from b3; key 2 never meets
    // key 1 even at identical times
    val a = iv(Seq((1L, 1L, 0L, 100L), (2L, 9L, 0L, 100L)))
    val b = iv(Seq((1L, 1L, 50L, 150L), (1L, 2L, 100L, 200L), (1L, 3L, 300L, 350L)))
    val got = AsOf.intervalOverlap(a, b, "k", bucketSeconds = 200L)
      .select("k", "a_id", "b_id", "overlap_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L, 1L, 50L)))
  }

  test("pairs spanning a bucket boundary are found once, not twice") {
    // both intervals straddle the t=200 boundary (buckets 0 and 1): the
    // banded join meets them in BOTH buckets; distinct must collapse it
    val a = iv(Seq((1L, 1L, 150L, 250L)))
    val b = iv(Seq((1L, 7L, 180L, 260L)))
    val got = AsOf.intervalOverlap(a, b, "k", bucketSeconds = 200L).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("overlap_s") == 250L - 180L)
  }

  test("an interval longer than the bucket width fails loudly") {
    val a = iv(Seq((1L, 1L, 0L, 500L)))
    val b = iv(Seq((1L, 2L, 10L, 20L)))
    val e = intercept[Exception] {
      AsOf.intervalOverlap(a, b, "k", bucketSeconds = 200L).collect()
    }
    assert(e.getMessage.contains("exceeds bucketSeconds") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds bucketSeconds")))
  }

  test("PROPERTY: banded join == naive overlap scan on random intervals") {
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val w = 50L
      def mk(n: Int) = (0 until n).map { i =>
        val s = rng.nextInt(400).toLong
        (rng.nextInt(4).toLong, i.toLong, s, s + rng.nextInt(w.toInt + 1))
      }
      val as = mk(60); val bs = mk(60)
      val got = AsOf.intervalOverlap(
          iv(as).repartition(7), iv(bs).repartition(3), "k", bucketSeconds = w)
        .select("k", "a_id", "b_id", "overlap_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = (for {
        (ka, ia, sa, ea) <- as
        (kb, ib, sb, eb) <- bs
        if ka == kb
        ov = math.min(ea, eb) - math.max(sa, sb)
        if ov > 0
      } yield (ka, ia, ib, ov)).toSet
      assert(got == want, s"trial $trial diverged from the naive cross check")
    }
  }
}
