package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference peel: same semantics, plain Scala. A vertex
    * whose last edge vanished still holds a live slot with degree 0 and
    * peels in the NEXT round (the alive set, not the degree table,
    * decides who can still be removed).
    */
  private def ref(edges: Seq[(Long, Long)], k: Int,
                  maxRounds: Int = 50): Map[Long, (Int, Int)] = {
    var cur = edges.map(e => if (e._1 < e._2) e else (e._2, e._1)).distinct
    var alive = cur.flatMap(e => Seq(e._1, e._2)).toSet
    var peeled = Map.empty[Long, Int]
    var round = 1
    var done = false
    while (!done && round <= maxRounds) {
      val deg = cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (x, xs) => x -> xs.size }
      val out = alive.filter(v => deg.getOrElse(v, 0) < k)
      if (out.isEmpty) done = true
      else {
        peeled ++= out.map(_ -> round)
        alive --= out
        cur = cur.filter(e => alive(e._1) && alive(e._2))
        round += 1
      }
    }
    val coreDeg = cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (x, xs) => x -> xs.size }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> peeled.get(v).map(r => (r, 0))
      .getOrElse((0, coreDeg.getOrElse(v, 0)))).toMap
  }

  private def got(edges: Seq[(Long, Long)], k: Int,
                  maxRounds: Int = 50): Map[Long, (Int, Int)] =
    KCore.peel(edges.toDF("u", "v"), k, maxRounds).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap

  test("pendant path peels layer by layer; the clique survives as the core") {
    // 4-clique {1,2,3,4} with a path 4-5-6-7 hanging off vertex 4
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val path = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val edges = clique ++ path
    val r = got(edges, k = 2)
    // only the path END is below k each round: 7 goes round 1, which
    // drops 6 below k for round 2, which drops 5 for round 3 — the
    // cascade the peel loop exists for. The clique survives at deg 3.
    assert(r(7L) == ((1, 0)) && r(6L) == ((2, 0)) && r(5L) == ((3, 0)), r.toString)
    assert(Seq(1L, 2L, 3L, 4L).forall(v => r(v) == ((0, 3))), r.toString)
    assert(r == ref(edges, 2))
    // at k=3 the whole path (degs 1-2) goes in one round instead
    val r3 = got(edges, k = 3)
    assert(Seq(5L, 6L, 7L).forall(v => r3(v) == ((1, 0))), r3.toString)
    assert(Seq(1L, 2L, 3L, 4L).forall(v => r3(v) == ((0, 3))), r3.toString)
    assert(r3 == ref(edges, 3))
  }

  test("cascade to empty: a cycle dies entirely at k=3") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val r = got(edges, k = 3)
    assert(r.values.forall(_ == ((1, 0))), r.toString) // all deg 2, one round
    assert(r == ref(edges, 3))
  }

  test("maxRounds cap reports the not-yet-peeled remainder as core") {
    // chain 1-2-3-4-5 at k=2: ends peel one round at a time (4 rounds to
    // empty); capped at 2 rounds the middle vertex 3 still has deg 2... n
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val r2 = got(edges, k = 2, maxRounds = 2)
    assert(r2(1L) == ((1, 0)) && r2(5L) == ((1, 0)))
    assert(r2(2L) == ((2, 0)) && r2(4L) == ((2, 0)))
    assert(r2(3L) == ((0, 0)), r2.toString) // survivor of the cap, no edges left
    assert(r2 == ref(edges, 2, maxRounds = 2))
    // uncapped the whole chain peels
    val r = got(edges, k = 2)
    assert(r(3L) == ((3, 0)), r.toString)
    assert(r == ref(edges, 2))
  }

  test("randomized graphs match the reference peel at several k") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(120)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    for (k <- Seq(2, 3, 5)) assert(got(edges, k) == ref(edges, k), s"k=$k")
  }
}
