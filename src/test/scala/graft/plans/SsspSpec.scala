package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def w(pairs: Seq[(Long, Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1, p._3))).distinct.toDF("u", "v", "w")

  test("a cheap detour beats the direct edge — true weighted shortest path") {
    // 1→3 direct costs 10; 1→2→3 costs 1+1=2
    val e = w(Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L)))
    val got = Sssp.bounded(e, Seq(1L).toDF("start"), rounds = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("round budget caps path length; later rounds refine, never regress") {
    // the only 2-hop improvement needs round 2
    val e = w(Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L)))
    val oneRound = Sssp.bounded(e, Seq(1L).toDF("start"), rounds = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(oneRound(3L) == 10L) // direct edge only after one round
    val twoRounds = Sssp.bounded(e, Seq(1L).toDF("start"), rounds = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(twoRounds(3L) == 2L)
  }

  test("non-positive and null weights fail loudly, not silently") {
    val bad = Seq((1L, 2L, 0L), (2L, 3L, 5L)).toDF("u", "v", "w")
    val ex = intercept[Exception] {
      Sssp.bounded(bad, Seq(1L).toDF("start"), rounds = 2).collect()
    }
    assert(ex.getMessage.contains("weights must be positive"))
    val nullW = Seq((1L, 2L, Some(3L)), (2L, 3L, None))
      .toDF("u", "v", "w")
    val ex2 = intercept[Exception] {
      Sssp.bounded(nullW, Seq(1L).toDF("start"), rounds = 2).collect()
    }
    assert(ex2.getMessage.contains("weights must be positive"))
  }

  test("PROPERTY: delta form matches sequential Bellman-Ford; partition-invariant") {
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val n = 18
      val dir = Seq.fill(50)((rng.nextInt(n).toLong, rng.nextInt(n).toLong,
        1L + rng.nextInt(9))).filter(p => p._1 != p._2)
      val und = (dir ++ dir.map(p => (p._2, p._1, p._3)))
        .groupBy(p => (p._1, p._2)).map { case (k, v) => (k._1, k._2, v.map(_._3).min) }
        .toSeq
      val seeds = und.map(_._1).distinct.sorted.take(3)
      val rounds = 4
      // sequential reference: `rounds` full relaxation sweeps
      // round-SYNCHRONOUS reference: every candidate reads the previous
      // round's snapshot (an in-place single-sweep fold would apply
      // chained relaxations the synchronous operator cannot)
      val want = seeds.flatMap { s0 =>
        var strict = Map(s0 -> 0L)
        for (_ <- 1 to rounds) {
          val snapshot = strict
          und.foreach { case (u, v, wt) =>
            snapshot.get(u).foreach { du =>
              if (strict.get(v).forall(_ > du + wt)) strict += (v -> (du + wt))
            }
          }
        }
        strict.map { case (node, dist) => (s0, node, dist) }
      }.sortBy(t => (t._1, t._2))
      val got = Sssp.bounded(und.toDF("u", "v", "w").repartition(7),
          seeds.toDF("start"), rounds = rounds)
        .orderBy("start", "node").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"trial $trial diverged from sequential Bellman-Ford")
    }
  }
}
