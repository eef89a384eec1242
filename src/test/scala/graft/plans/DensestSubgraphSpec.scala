package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DensestSubgraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the exact batched peel. */
  private def ref(edges: Seq[(Long, Long)], epsNum: Long = 1L, epsDen: Long = 10L,
                  maxRounds: Int = 30): Seq[(Int, Long, Long, Long, Long, Int)] = {
    var cur = edges.map(e => if (e._1 < e._2) e else (e._2, e._1))
      .filter(e => e._1 != e._2).distinct
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var round = 0
    while (cur.nonEmpty && round < maxRounds) {
      val m = cur.size.toLong
      val vs = cur.flatMap(e => Seq(e._1, e._2)).distinct
      val n = vs.size.toLong
      out += ((round, n, m, vs.sum))
      val deg = cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (x, xs) => x -> xs.size.toLong }
      val keep = vs.filter(v => deg(v) * n * epsDen > 2L * (epsDen + epsNum) * m).toSet
      cur = cur.filter(e => keep(e._1) && keep(e._2))
      round += 1
    }
    val best = out.maxBy { case (r, n, m, _) => (m * 1000000L / n, -r) }._1
    out.map { case (r, n, m, cks) =>
      (r, n, m, m * 1000000L / n, cks, if (r == best) 1 else 0)
    }.toSeq
  }

  private def got(edges: Seq[(Long, Long)], maxRounds: Int = 30): Seq[(Int, Long, Long, Long, Long, Int)] =
    DensestSubgraph.peelSummary(edges.toDF("u", "v"), maxRounds = maxRounds)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSeq

  test("a planted clique out-survives a denser fringe and is the best round") {
    // 6-clique + a mostly-3-regular 30-vertex fringe (ring + 14 chords)
    // and one clique→fringe bridge. Round 0: n=36, m=60, so the keep bar
    // is deg·36·10 > 22·60 ⇔ deg > 3.67 — the whole fringe (deg ≤ 3,
    // bridge endpoint included) peels at once, the clique (deg ≥ 5)
    // survives. Round 1 is then EXACTLY the clique (n=6, m=15, ρ=2.5),
    // the densest round; round 2 peels it entirely (regular graphs
    // always fail the 2(1+ε)ρ bar) and the trajectory ends.
    val clique = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    val ring = (0 until 30).map(i => (100L + i, 100L + (i + 1) % 30))
    val chords = (1 until 15).map(i => (100L + i, 100L + i + 15))
    val edges = clique ++ ring ++ chords ++ Seq((6L, 100L))
    val r = got(edges)
    assert(r == ref(edges), r.toString)
    assert(r.size == 2, r.toString)
    val best = r.find(_._6 == 1).get
    // the best round keeps exactly the clique: n=6, m=15, checksum 21
    assert(best._1 == 1 && best._2 == 6 && best._3 == 15 && best._5 == 21L,
      best.toString)
    assert(best._4 == 2500000L, best.toString)
  }

  test("uniform graph: round 0 is best and everything peels in few rounds") {
    val ring = (0 until 12).map(i => (i.toLong, ((i + 1) % 12).toLong))
    val r = got(ring)
    assert(r == ref(ring), r.toString)
    assert(r.head._6 == 1 && r.head._4 == 1000000L, r.toString) // density exactly 1
  }

  test("randomized graphs reproduce the reference trajectory") {
    val rng = new scala.util.Random(23)
    val edges = Seq.fill(200)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    assert(got(edges) == ref(edges))
  }

  test("maxRounds truncates the trajectory identically") {
    val rng = new scala.util.Random(5)
    val edges = Seq.fill(150)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    assert(got(edges, maxRounds = 2) == ref(edges, maxRounds = 2))
  }
}
