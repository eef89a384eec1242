package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: count unordered vertex triples with all
    * three edges present.
    */
  private def ref(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val es = und.toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val deg = vs.map(v => und.count(e => e._1 == v || e._2 == v).toLong)
    val tris = (for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      if es((vs(i), vs(j))) && es((vs(i), vs(k))) && es((vs(j), vs(k)))
    } yield 1).size.toLong
    (und.size.toLong, deg.map(d => d * (d - 1) / 2).sum, tris)
  }

  private def counts(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Triangles.counts(edges.toDF("u", "v")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("known shapes: triangle, square, K5, star, with loops and dup/reversed edges") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 1L))) == ((3L, 3L, 1L)))
    // square: 4 edges, 4 wedges, no triangle
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 0L)))
    // K5: C(5,2)=10 edges, 5*C(4,2)=30 wedges, C(5,3)=10 triangles
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    assert(counts(k5) == ((10L, 30L, 10L)))
    // star has wedges but no triangles; loops and duplicates are dropped
    assert(counts(Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 0L), (2L, 2L))) == ((3L, 3L, 0L)))
  }

  test("randomized graphs match the brute-force reference") {
    val rng = new scala.util.Random(67L)
    for (trial <- 1 to 5) {
      val n = 8 + rng.nextInt(10)
      val edges = Seq.fill(3 * n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      assert(counts(edges) == ref(edges), s"trial $trial: $edges")
    }
  }

  test("empty and edgeless inputs yield zero counts") {
    assert(counts(Seq.empty) == ((0L, 0L, 0L)))
    assert(counts(Seq((7L, 7L))) == ((0L, 0L, 0L)))
  }

  test("DataFrame census and the GraphX twin agree on random graphs") {
    val rng = new scala.util.Random(72L)
    for (trial <- 1 to 3) {
      val n = 10 + rng.nextInt(10)
      val edges = Seq.fill(4 * n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val df = edges.toDF("u", "v")
      val a = Triangles.counts(df).collect()(0)
      val b = GraphAnalytics.triangleCounts(df).collect()(0)
      assert((a.getLong(0), a.getLong(1), a.getLong(2)) ==
        ((b.getLong(0), b.getLong(1), b.getLong(2))), s"trial $trial")
    }
  }

  test("perNodeCounts: K4 plus a pendant — exact per-vertex features") {
    // K4 on 1-4 (every vertex in 3 triangles, cc = 1) + pendant 5 on 4
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Triangles.perNodeCounts(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 1000L),
      (2L, 3L, 3L, 1000L),
      (3L, 3L, 3L, 1000L),
      (4L, 4L, 3L, 500L), // 3 triangles over C(4,2)=6 wedges
      (5L, 1L, 0L, 0L))) // degree-1: cc defined as 0
  }

  test("perNodeCounts sums to 3x the census triangle count on random graphs") {
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val n = 12 + rng.nextInt(8)
      val edges = Seq.fill(4 * n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val df = edges.toDF("u", "v")
      val perNode = Triangles.perNodeCounts(df).collect()
      val census = Triangles.counts(df).collect()(0)
      assert(perNode.map(_.getLong(2)).sum == 3L * census.getLong(2), s"trial $trial")
      assert(perNode.map(_.getLong(1)).sum == 2L * census.getLong(0), s"trial $trial")
    }
  }
}
