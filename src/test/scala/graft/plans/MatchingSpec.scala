package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatchingSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's exact edge priority: full md5 hex of "match:u:v". */
  private def pe(u: Long, v: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"match:$u:$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Sequential reference: round-synchronous locally-minimal matching
    * with the same priority, trajectory with fixpoint-zero padding.
    */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long)] = {
    var e = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    for (r <- 1 to rounds) {
      if (e.isEmpty) out += ((r, 0L, 0L))
      else {
        val vmin = (e.map(p => (p._1, pe(p._1, p._2))) ++ e.map(p => (p._2, pe(p._1, p._2))))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
        val sel = e.filter(p => pe(p._1, p._2) == vmin(p._1) && pe(p._1, p._2) == vmin(p._2))
        val matched = sel.flatMap(p => Seq(p._1, p._2)).toSet
        e = e.filter(p => !matched(p._1) && !matched(p._2))
        out += ((r, sel.size.toLong, e.size.toLong))
      }
    }
    out.toSeq
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long)] =
    Matching.trajectory(edges.toDF("u", "v"), rounds)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  test("matches the sequential reference on a path graph") {
    val path = (0L until 10L).map(i => (i, i + 1))
    assert(run(path, 4) === reference(path, 4))
  }

  test("matches the sequential reference on a clique + pendant edges") {
    val clique = for (a <- 0L until 6L; b <- (a + 1) until 6L) yield (a, b)
    val g = clique ++ Seq((5L, 10L), (10L, 11L), (2L, 20L))
    assert(run(g, 5) === reference(g, 5))
  }

  test("star graph matches exactly one edge in round 1 and converges") {
    val star = (1L to 8L).map(l => (0L, l))
    val t = run(star, 3)
    // all star edges share vertex 0: exactly one can ever match, after
    // which every other edge retires with the center
    assert(t.head === ((1, 1L, 0L)))
    assert(t.tail.forall(r => r._2 == 0L && r._3 == 0L))
    assert(t === reference(star, 3))
  }

  test("matched edges form a maximal matching (no active edge survives)") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L), (5L, 6L), (7L, 7L))
    val t = run(g, 6)
    // self-loop dropped; convergence = no remaining edges
    assert(t.last._3 === 0L)
    // C5 matches exactly 2 edges, the isolated edge 1 — total 3
    assert(t.map(_._2).sum === 3L)
    assert(t === reference(g, 6))
  }

  test("duplicate and reversed edges canonicalize") {
    val g = Seq((1L, 0L), (0L, 1L), (1L, 2L), (2L, 1L))
    assert(run(g, 3) === reference(Seq((0L, 1L), (1L, 2L)), 3))
  }

  test("PROPERTY: random multigraphs match the sequential reference") {
    for (seed <- 1L to 4L) {
      val g = GraphGen.randGraph(seed, n = 18, m = 30)
      assert(run(g, 4) === reference(g, 4), s"seed $seed: $g")
    }
  }

  test("rejects non-positive maxRounds") {
    intercept[IllegalArgumentException] {
      Matching.trajectory(Seq((0L, 1L)).toDF("u", "v"), 0)
    }
  }

  /** Sequential weighted reference: heaviest-incident-edge rounds with
    * the operator's exact (inverted-weight ⧺ md5) key order.
    */
  private def wkey(u: Long, v: Long, w: Long): String =
    f"${1000000000000L - w}%013d" + {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"hmatch:$u:$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

  private def wreference(edges: Seq[(Long, Long, Long)],
                         rounds: Int): Seq[(Int, Long, Long, Long)] = {
    var e = edges.map(t => (math.min(t._1, t._2), math.max(t._1, t._2), t._3))
      .filter(t => t._1 != t._2)
      .groupBy(t => (t._1, t._2)).map { case ((u, v), ts) => (u, v, ts.map(_._3).sum) }
      .toSeq
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    for (r <- 1 to rounds) {
      if (e.isEmpty) out += ((r, 0L, 0L, 0L))
      else {
        val vmin = (e.map(t => (t._1, wkey(t._1, t._2, t._3))) ++
            e.map(t => (t._2, wkey(t._1, t._2, t._3))))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
        val sel = e.filter(t => wkey(t._1, t._2, t._3) == vmin(t._1) &&
          wkey(t._1, t._2, t._3) == vmin(t._2))
        val matched = sel.flatMap(t => Seq(t._1, t._2)).toSet
        e = e.filter(t => !matched(t._1) && !matched(t._2))
        out += ((r, sel.size.toLong, sel.map(_._3).sum, e.size.toLong))
      }
    }
    out.toSeq
  }

  private def wrun(edges: Seq[(Long, Long, Long)], rounds: Int): Seq[(Int, Long, Long, Long)] =
    Matching.weightedTrajectory(edges.toDF("u", "v", "w"), rounds)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("weighted: the heaviest edge wins its neighborhood") {
    // triangle with one heavy edge: (0,1,w=10) beats both neighbors
    val g = Seq((0L, 1L, 10L), (1L, 2L, 3L), (0L, 2L, 3L))
    val t = wrun(g, 2)
    assert(t === wreference(g, 2))
    assert(t.head === ((1, 1L, 10L, 0L))) // heavy edge matches, rest retire
  }

  test("weighted: parallel edges merge weights before matching") {
    // (0,1) appears twice with weights 2+4=6, outweighing (1,2,w=5)
    val g = Seq((0L, 1L, 2L), (1L, 0L, 4L), (1L, 2L, 5L))
    val t = wrun(g, 2)
    assert(t === wreference(Seq((0L, 1L, 6L), (1L, 2L, 5L)), 2))
    assert(t.head._3 === 6L)
  }

  test("weighted PROPERTY: random weighted multigraphs match the reference") {
    for (seed <- 31L to 34L) {
      val es = GraphGen.randGraph(seed, n = 14, m = 26)
      val g = es.zipWithIndex.map { case ((u, v), i) => (u, v, (i % 7 + 1).toLong) }
      assert(wrun(g, 4) === wreference(g, 4), s"seed $seed: $g")
    }
  }

  test("coarsenOnce: contraction conserves weight and shrinks the graph") {
    // two heavy pairs (0,1) and (2,3) with a light cross edge (1,2):
    // both pairs match, the cross edge survives re-keyed (0,2)
    val g = Seq((0L, 1L, 9L), (2L, 3L, 8L), (1L, 2L, 1L))
    val r = Matching.coarsenOnce(g.toDF("u", "v", "w")).collect()(0)
    val (nv, np, nsv, nse) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (before, after, collapsed) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert((nv, np, nsv, nse) === ((4L, 2L, 2L, 1L)))
    assert((before, after, collapsed) === ((18L, 1L, 17L)))
  }

  test("coarsenOnce: parallel coarse edges merge; unmatched vertices survive") {
    // triangle 0-1-2 plus pendant 3: (0,1) heaviest matches; edges
    // (1,2) and (0,2) both re-key to (0,2) and merge to weight 4
    val g = Seq((0L, 1L, 10L), (1L, 2L, 3L), (0L, 2L, 1L), (2L, 3L, 2L))
    val r = Matching.coarsenOnce(g.toDF("u", "v", "w")).collect()(0)
    assert(r.getLong(0) === 4L)  // vertices
    assert(r.getLong(1) === 1L)  // one matched pair — (2,3) also matches?
    // NOTE: (2,3) has no heavier incident edge after... within ONE round
    // (2,3): incident edges at 2 are (1,2,3),(0,2,1),(2,3,2) — heaviest
    // at 2 is (1,2,w=3), so (2,3) does NOT match in round 1
    assert(r.getLong(2) === 3L)  // supervertices {0}, {2}, {3}
    assert(r.getLong(4) === r.getLong(5) + r.getLong(6)) // conservation
  }

  test("PROPERTY: coarsenOnce conserves weight on random weighted graphs") {
    for (seed <- 41L to 44L) {
      val es = GraphGen.randGraph(seed, n = 12, m = 24).filter(p => p._1 != p._2)
      if (es.nonEmpty) {
        val g = es.zipWithIndex.map { case ((u, v), i) => (u, v, (i % 5 + 1).toLong) }
        val r = Matching.coarsenOnce(g.toDF("u", "v", "w")).collect()(0)
        assert(r.getLong(4) === r.getLong(5) + r.getLong(6), s"seed $seed")
        assert(r.getLong(2) === r.getLong(0) - r.getLong(1), s"seed $seed")
      }
    }
  }

  test("partitionCut: hand-computed assignment, cut, and balance") {
    // triangle 0-1-2 plus pendant 3 (the coarsenOnce fixture): one
    // matched pair (0,1) → supervertices {0}(bw2), {2}(bw1), {3}(bw1);
    // weight-desc round-robin with k=2 assigns 0→p0, 2→p1, 3→p0.
    // Coarse edges (0,2,w4) and (2,3,w2) both cross → cut 6, internal 0.
    val g = Seq((0L, 1L, 10L), (1L, 2L, 3L), (0L, 2L, 1L), (2L, 3L, 2L))
    val rows = Matching.partitionCut(g.toDF("u", "v", "w"), k = 2)
      .orderBy("partition").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ===
      Seq((0L, 2L, 3L, 0L, 6L), (1L, 1L, 1L, 0L, 6L)))
  }

  test("PROPERTY: partitionCut invariants vs coarsenOnce on random graphs") {
    for (seed <- 51L to 54L) {
      val es = GraphGen.randGraph(seed, n = 12, m = 24).filter(p => p._1 != p._2)
      if (es.nonEmpty) {
        val g = es.zipWithIndex.map { case ((u, v), i) => (u, v, (i % 5 + 1).toLong) }
        val co = Matching.coarsenOnce(g.toDF("u", "v", "w")).collect()(0)
        val parts = Matching.partitionCut(g.toDF("u", "v", "w"), k = 2).collect()
        // base-vertex mass is conserved across partitions
        assert(parts.map(_.getLong(2)).sum === co.getLong(0), s"seed $seed")
        // supervertex count is conserved and balanced to within one
        val ns = parts.map(_.getLong(1))
        assert(ns.sum === co.getLong(2), s"seed $seed")
        assert(ns.max - ns.min <= 1L, s"seed $seed")
        // every coarse edge is internal or cut, exactly once
        assert(parts.map(_.getLong(3)).sum + parts(0).getLong(4)
          === co.getLong(5), s"seed $seed")
      }
    }
  }

  test("coarsenTrajectory: level 1 == coarsenOnce; per-level invariants hold") {
    for (seed <- 71L to 73L) {
      val es = GraphGen.randGraph(seed, n = 14, m = 28).filter(p => p._1 != p._2)
      if (es.nonEmpty) {
        val g = es.zipWithIndex.map { case ((u, v), i) => (u, v, (i % 5 + 1).toLong) }
        val once = Matching.coarsenOnce(g.toDF("u", "v", "w")).collect()(0)
        val traj = Matching.coarsenTrajectory(g.toDF("u", "v", "w"), levels = 3)
          .orderBy("level").collect()
        // level 1 must be exactly the single-level operator's row
        assert(traj(0).toSeq.tail === once.toSeq, s"seed $seed")
        traj.foreach { r =>
          // contraction arithmetic + conservation at every level
          assert(r.getLong(3) === r.getLong(1) - r.getLong(2), s"seed $seed lvl ${r.getInt(0)}")
          assert(r.getLong(5) === r.getLong(6) + r.getLong(7), s"seed $seed lvl ${r.getInt(0)}")
        }
        // levels chain: level i+1 starts on level i's coarse graph —
        // its edge weight is exactly level i's surviving weight, and
        // its vertex set is level i's supervertices MINUS any that
        // collapsed into isolation (no surviving incident edge)
        traj.sliding(2).foreach { case Array(a, b) =>
          assert(b.getLong(1) <= a.getLong(3), s"seed $seed: vertex chain")
          assert(b.getLong(5) === a.getLong(6), s"seed $seed: weight chain")
        case _ => ()
        }
      }
    }
  }

  test("refineOnce: hand-computed gains, parity gate, and both cuts") {
    // the partitionCut fixture: assignment 0→p0, 2→p1, 3→p0 with coarse
    // edges (0,2,w4),(2,3,w2). Every vertex is boundary with positive
    // gain (connectivity 4/6/2 vs 0 internal); which ones MOVE is the
    // md5 parity bit, and the new cut follows from the moved set.
    def par(x: Long): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s"refine:$x".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(7), 16) % 2
    val g = Seq((0L, 1L, 10L), (1L, 2L, 3L), (0L, 2L, 1L), (2L, 3L, 2L))
    val r = Matching.refineOnce(g.toDF("u", "v", "w"), k = 2).collect()(0)
    val before = Map(0L -> 0L, 2L -> 1L, 3L -> 0L)
    val target = Map(0L -> 1L, 2L -> 0L, 3L -> 1L)
    val after = before.map { case (x, p) =>
      x -> (if (par(x) == 0L) target(x) else p) }
    val cutAfter = Seq((0L, 2L, 4L), (2L, 3L, 2L))
      .filter { case (a, b, _) => after(a) != after(b) }.map(_._3).sum
    val moved = before.keys.count(x => par(x) == 0L).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((3L, 3L, 3L, moved, 6L, cutAfter)))
  }

  test("PROPERTY: refineOnce counts nest and cut_before matches partitionCut") {
    for (seed <- 61L to 64L) {
      val es = GraphGen.randGraph(seed, n = 12, m = 24).filter(p => p._1 != p._2)
      if (es.nonEmpty) {
        val g = es.zipWithIndex.map { case ((u, v), i) => (u, v, (i % 5 + 1).toLong) }
        val r = Matching.refineOnce(g.toDF("u", "v", "w"), k = 2).collect()(0)
        val cut = Matching.partitionCut(g.toDF("u", "v", "w"), k = 2)
          .collect()(0).getLong(4)
        assert(r.getLong(4) === cut, s"seed $seed: cut_before vs partitionCut")
        assert(r.getLong(3) <= r.getLong(2), s"seed $seed: moved <= candidates")
        assert(r.getLong(2) <= r.getLong(1), s"seed $seed: candidates <= boundary")
        assert(r.getLong(1) <= r.getLong(0), s"seed $seed: boundary <= vertices")
      }
    }
  }

  test("weighted: null / non-positive / oversized weights fail loudly") {
    def messageOf(body: => Unit): String =
      intercept[Exception](body).getMessage
    val bad = Seq((0L, 1L, 0L)).toDF("u", "v", "w")
    assert(messageOf(Matching.weightedTrajectory(bad, 2).collect())
      .contains("weights must be integers"))
    val huge = Seq((0L, 1L, 2000000000000L)).toDF("u", "v", "w")
    assert(messageOf(Matching.weightedTrajectory(huge, 2).collect())
      .contains("weights must be integers"))
  }
}
