package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MisSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's exact packed priority: 28-bit md5 prefix · 2³¹ + id. */
  private def pk(id: Long, salt: String = "mis:"): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(7)
    java.lang.Long.parseLong(hex, 16) * (1L << 31) + id
  }

  /** Sequential reference: round-synchronous Luby with the same packed
    * priority, returning the (n_selected, n_remaining) trajectory with
    * converged rounds repeating the fixpoint zeros.
    */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long)] = {
    val und = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    var adj: Map[Long, Set[Long]] = und.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var active = adj.keySet
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    for (r <- 1 to rounds) {
      if (active.isEmpty) out += ((r, 0L, 0L))
      else {
        val sel = active.filter(v =>
          adj.getOrElse(v, Set.empty).intersect(active).forall(n => pk(v) < pk(n)))
        val retired = sel ++ sel.flatMap(v => adj.getOrElse(v, Set.empty))
        active = active -- retired
        adj = adj.collect { case (k, vs) if active(k) => k -> vs.intersect(active) }
        out += ((r, sel.size.toLong, active.size.toLong))
      }
    }
    out.toSeq
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long)] =
    Mis.trajectory(edges.toDF("u", "v"), rounds)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  test("an empty edge set yields the documented fixpoint trajectory of zeros") {
    // regression (r15 ADVICE): the single setup probe aggregates sum()
    // over zero vertex rows, which is null — getLong on it NPE'd where
    // the earlier filter-based guard handled an empty graph
    val empty = run(Seq.empty, 3)
    assert(empty === Seq((1, 0L, 0L), (2, 0L, 0L), (3, 0L, 0L)))
    // self-loops-only reduces to the empty graph after undirection
    assert(run(Seq((7L, 7L)), 2) === Seq((1, 0L, 0L), (2, 0L, 0L)))
  }

  test("matches the sequential reference on a path graph") {
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(run(path, 4) === reference(path, 4))
  }

  test("matches the sequential reference on a clique + pendant") {
    val clique = for (a <- 0L until 6L; b <- (a + 1) until 6L) yield (a, b)
    val g = clique ++ Seq((5L, 10L), (10L, 11L))
    assert(run(g, 4) === reference(g, 4))
  }

  test("star graph: round counts depend only on the center/leaf priority order") {
    // center 0 vs leaves 1..12: either the center wins round 1 (selects,
    // all leaves retire) or some leaf beats it (all minimal leaves
    // select, center retires, rest select next round). Both shapes
    // must match the reference exactly.
    val star = (1L to 12L).map(l => (0L, l))
    assert(run(star, 3) === reference(star, 3))
  }

  test("selected counts sum to a maximal independent set (trajectory reaches empty)") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (4L, 5L), (6L, 6L))
    val t = run(g, 6)
    // self-loop dropped; eventually no active vertices remain
    assert(t.last._3 === 0L)
    // post-convergence rounds are fixpoint zeros
    val firstEmpty = t.indexWhere(_._3 == 0L)
    assert(t.drop(firstEmpty + 1).forall(r => r._2 == 0L && r._3 == 0L))
    // every vertex was either selected or retired as a neighbor:
    // selected count is a valid independent-set size for C4 + edge (≤ 3)
    val totalSelected = t.map(_._2).sum
    assert(totalSelected >= 2L && totalSelected <= 3L)
  }

  test("duplicate and reversed edges canonicalize") {
    val g = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L))
    assert(run(g, 3) === reference(Seq((0L, 1L), (1L, 2L)), 3))
  }

  test("PROPERTY: random multigraphs match the sequential reference") {
    for (seed <- 1L to 4L) {
      val g = GraphGen.randGraph(seed, n = 18, m = 30)
      assert(run(g, 4) === reference(g, 4), s"seed $seed: $g")
    }
  }

  test("wide ids (>= 2^31) take the struct order and still produce a valid MIS") {
    // the r14 sf4.0 cliff: lake-scale vertex ids are arbitrary int64 —
    // the packed form must not be a correctness boundary. Invariants
    // checked structurally (priorities differ from any small-id twin,
    // so no golden to compare): rounds select positives until empty,
    // remaining is strictly decreasing to zero.
    val wide = GraphGen.randGraph(7L, n = 14, m = 24)
      .map { case (u, v) => (u + (1L << 32), v + (1L << 32)) }
    val t = Mis.trajectory(wide.toDF("u", "v"), 6).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(t.last._3 === 0L, s"did not converge: ${t.toSeq}")
    val activeSeq = t.map(_._3)
    assert(activeSeq.zip(activeSeq.tail).forall { case (a, b) => b <= a })
    assert(t.filter(_._3 > 0).forall(_._2 >= 0))
    assert(t.map(_._2).sum > 0)
  }

  test("struct order == packed order where both are valid") {
    // same hash, same (h, id) total order — the wide-id fallback must
    // be a pure representation change, never a different MIS
    for (seed <- 11L to 13L) {
      val g = GraphGen.randGraph(seed, n = 16, m = 28).toDF("u", "v")
      val packed = Mis.trajectory(g, 5, forcePacked = Some(true)).collect().map(_.toSeq)
      val struct = Mis.trajectory(g, 5, forcePacked = Some(false)).collect().map(_.toSeq)
      assert(packed.toSeq === struct.toSeq, s"seed $seed")
    }
  }

  test("rejects NON-NUMERIC ids loudly (the guard must not fail open on null casts)") {
    // a string id null-casts to long; before the cast-aware guard this
    // passed the range check silently and every vertex selected in round 1
    val bad = Seq(("node_a", "node_b"), ("node_b", "node_c")).toDF("u", "v")
    intercept[IllegalArgumentException] { Mis.trajectory(bad, 2) }
  }
}
