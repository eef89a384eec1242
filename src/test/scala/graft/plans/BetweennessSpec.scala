package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def und(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).distinct.toDF("u", "v")

  /** Sequential truncated Brandes with the operator's exact integer
    * arithmetic (per-term floor division at `scale`).
    */
  private def ref(pairs: Seq[(Long, Long)], seeds: Seq[Long], maxDepth: Int,
                  scale: Long = 1000L): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(_.swap)).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val out = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (s <- seeds) {
      var levels = List(Map(s -> 1L)) // level 0: sigma(seed) = 1
      var visited = Set(s)
      var d = 0
      while (d < maxDepth && levels.head.nonEmpty) {
        d += 1
        val next = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for ((u, sig) <- levels.head; v <- adj.getOrElse(u, Set.empty)
             if !visited.contains(v)) next(v) += sig
        visited ++= next.keySet
        levels = next.toMap :: levels
      }
      // levels is deepest-first; accumulate delta upward
      var delta = levels.head.keys.map(_ -> 0L).toMap
      for (List(deeper, cur) <- levels.sliding(2)) {
        val newDelta = cur.map { case (v, sig) =>
          v -> adj.getOrElse(v, Set.empty).toSeq.sorted
            .filter(deeper.contains)
            .map(w => sig * (scale + delta(w)) / deeper(w)).sum
        }
        newDelta.foreach { case (v, dl) => if (v != s) out(v) += dl }
        delta = newDelta
      }
    }
    out.toMap.filter(_._2 > 0)
  }

  private def run(pairs: Seq[(Long, Long)], seeds: Seq[Long], maxDepth: Int) =
    Betweenness.sampled(und(pairs), seeds.toDF("start"), maxDepth)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("path graph 1-2-3-4-5, seed 1, radius 3: dependency chains down the path") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // sigma = 1 everywhere; delta(4)=0 at the deepest level... backward:
    //   d2: delta(3) = 1*(1000+0)/1 = 1000; d1: delta(2) = 1*(1000+1000)/1 = 2000
    val got = run(pairs, Seq(1L), maxDepth = 3)
    assert(got == Map(2L -> 2000L, 3L -> 1000L))
    assert(got == ref(pairs, Seq(1L), 3))
  }

  test("diamond 1-{2,3}-4: two shortest paths split the dependency") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    // from seed 1: sigma(2)=sigma(3)=1, sigma(4)=2;
    // delta(2) = 1*(1000+0)/2 = 500 = delta(3)
    val got = run(pairs, Seq(1L), maxDepth = 2)
    assert(got == Map(2L -> 500L, 3L -> 500L))
    assert(got == ref(pairs, Seq(1L), 2))
  }

  private def msgChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("BOUNDARY just under 2^63: exact at scale = Long.MaxValue/2 - 1") {
    // directed chain s→a→b, depth 2: every sigma is 1, the largest
    // intermediate is the seed's term 1·(scale + scale) = 2·scale,
    // which fits a long exactly at this scale — the budget guard must
    // NOT fire and the answer must be exact integer Brandes
    val scale = Long.MaxValue / 2 - 1
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("u", "v")
    val got = Betweenness.sampled(edges, Seq(0L).toDF("start"), maxDepth = 2, scale = scale)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // delta(b)=0; delta(a) = 1·(scale+0)/1 = scale; seed filtered
    assert(got == Map(1L -> scale))
  }

  test("BOUNDARY just over 2^63 (scale+delta term): loud budget error, not a wrap") {
    // same chain one level deeper at scale = Long.MaxValue/2 + 1: the
    // seed's term needs scale + delta(a) = 2·scale + 2 > 2^63 — the
    // rhs budget guard must raise the descriptive error in any SQL mode
    val scale = Long.MaxValue / 2 + 1
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("u", "v")
    val e = intercept[Throwable] {
      Betweenness.sampled(edges, Seq(0L).toDF("start"), maxDepth = 2, scale = scale)
        .collect()
    }
    assert(msgChain(e).contains("overflow budget"), msgChain(e))
  }

  test("BOUNDARY just over 2^63 (sigma·(scale+delta) product): loud budget error") {
    // directed diamond s→{a,b}→c→d: sigma(c) = 2, so c's term is
    // 2·(scale + 0) which crosses 2^63 at scale = Long.MaxValue/2 + 1
    // even though scale + delta itself fits — the product guard's case
    val scale = Long.MaxValue / 2 + 1
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val e = intercept[Throwable] {
      Betweenness.sampled(edges, Seq(0L).toDF("start"), maxDepth = 3, scale = scale)
        .collect()
    }
    assert(msgChain(e).contains("overflow budget"), msgChain(e))
  }

  test("PROPERTY: matches the sequential reference on random graphs, multi-seed") {
    val rng = new scala.util.Random(81L)
    for (trial <- 1 to 3) {
      val n = 12 + rng.nextInt(8)
      val pairs = Seq.fill(3 * n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val seeds = (0L until n.toLong by 3).toSeq
      val got = run(pairs, seeds, maxDepth = 2)
      assert(got == ref(pairs, seeds, 2), s"trial $trial")
    }
  }
}
