package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiSourceBfsSpec extends SparkSpec {
  import spark.implicits._

  private def und(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).distinct.toDF("u", "v")

  test("path graph: exact distances, sums, and eccentricity per seed") {
    // 1-2-3-4-5; radius 2 from seeds 1 and 3
    val e = und(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val got = MultiSourceBfs.truncatedCloseness(e, Seq(1L, 3L).toDF("start"), maxDepth = 2)
      .orderBy("start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    // seed 1 reaches {1@0, 2@1, 3@2}: n=3, sum=3, ecc=2
    // seed 3 reaches {3@0, 2@1, 4@1, 1@2, 5@2}: n=5, sum=6, ecc=2
    assert(got == Seq((1L, 3L, 3L, 2), (3L, 5L, 6L, 2)))
  }

  test("frontier drains early on a small component — extra depth is a no-op") {
    val e = und(Seq((1L, 2L))) // diameter 1
    val shallow = MultiSourceBfs.truncatedCloseness(e, Seq(1L).toDF("start"), maxDepth = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val deep = MultiSourceBfs.truncatedCloseness(e, Seq(1L).toDF("start"), maxDepth = 6)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(shallow == deep && deep == Seq((2L, 1L)))
  }

  test("harmonic centrality: exact scale-div-dist sums; unreachable contributes 0") {
    // two components: path 1-2-3, isolated edge 10-11; radius 2 from 1 and 10
    val e = und(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    val got = MultiSourceBfs.harmonicCentrality(
        e, Seq(1L, 10L).toDF("start"), maxDepth = 2)
      .orderBy("start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // seed 1: 2@1 → 1000000, 3@2 → 500000; total 1500000 (self excluded)
    // seed 10: 11@1 → 1000000; the other component contributes NOTHING —
    // the property that makes harmonic robust where closeness is undefined
    assert(got == Seq((1L, 3L, 1500000L), (10L, 2L, 1000000L)))
    // odd divisor floors: path 1-2-3-4, radius 3 from 1 → 1000000 + 500000 + 333333
    val e2 = und(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val h = MultiSourceBfs.harmonicCentrality(e2, Seq(1L).toDF("start"), maxDepth = 3)
      .head()
    assert(h.getLong(2) == 1833333L)
  }

  test("PROPERTY: matches sequential BFS on random graphs, partition-invariant") {
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val n = 25
      val pairs = Seq.fill(60)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val adj = (pairs ++ pairs.map(_.swap)).distinct
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val seeds = adj.keys.toSeq.sorted.take(4)
      val depth = 3
      val want = seeds.map { s0 =>
        var vis = Map(s0 -> 0)
        var frontier = Set(s0)
        for (d <- 1 to depth) {
          val nxt = frontier.flatMap(x => adj.getOrElse(x, Set.empty)) -- vis.keySet
          vis = vis ++ nxt.map(_ -> d)
          frontier = nxt
        }
        (s0, vis.size.toLong, vis.values.sum.toLong, vis.values.max)
      }.sortBy(_._1)
      val got = MultiSourceBfs.truncatedCloseness(
          und(pairs).repartition(7), seeds.toDF("start"), maxDepth = depth)
        .orderBy("start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
      assert(got == want, s"trial $trial diverged from sequential BFS")
    }
  }
}
