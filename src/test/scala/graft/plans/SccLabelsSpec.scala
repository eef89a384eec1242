package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SccLabelsSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: FULL (non-delta) round-synchronous min-label
    * propagation — the delta optimization must compute identical state.
    */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long, Long)] = {
    val ed = edges.filter(p => p._1 != p._2).distinct
    val vs = ed.flatMap(p => Seq(p._1, p._2)).distinct
    var f = vs.map(v => v -> v).toMap
    var b = vs.map(v => v -> v).toMap
    def stats(r: Int) = (r,
      vs.count(v => f(v) == b(v)).toLong,
      f.values.sum, b.values.sum)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)](stats(0))
    for (r <- 1 to rounds) {
      f = vs.map { v =>
        val in = ed.collect { case (s, d) if d == v => f(s) }
        v -> (f(v) +: in).min
      }.toMap
      b = vs.map { v =>
        val out2 = ed.collect { case (s, d) if s == v => b(d) }
        v -> (b(v) +: out2).min
      }.toMap
      out += stats(r)
    }
    out.toSeq
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long, Long)] =
    SccLabels.trajectory(edges.toDF("src", "dst"), rounds)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("matches the full-propagation reference on a directed cycle") {
    val cyc = (0L until 5L).map(i => (i, (i + 1) % 5))
    assert(run(cyc, 5) === reference(cyc, 5))
    // at round 5 every cycle vertex certifies into SCC of 0
    assert(run(cyc, 5).last._2 === 5L)
  }

  test("matches the reference on a DAG (only trivial certificates survive)") {
    val dag = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val t = run(dag, 3)
    assert(t === reference(dag, 3))
    // a DAG has only singleton SCCs: once labels spread, a vertex
    // certifies iff it is its own min ancestor AND min descendant —
    // here only vertex 0 (f=b=0)
    assert(t.last._2 === 1L)
  }

  test("two cycles bridged by a one-way edge certify separately") {
    // cycle A {0,1,2}, cycle B {10,11,12}, bridge 2 -> 10
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L))
    val t = run(g, 4)
    assert(t === reference(g, 4))
    // A certifies into SCC(0); B's members reach back to 10 but their
    // forward min becomes 0 (via the bridge) while backward min stays
    // 10 — so B never certifies against the foreign label. Certified
    // count settles at |A| = 3: the residual (B) is exactly what the
    // FW-BW recursion would re-run on.
    assert(t.last._2 === 3L)
  }

  test("delta propagation reaches the fixpoint and repeats it exactly") {
    val cyc = (0L until 4L).map(i => (i, (i + 1) % 4))
    val t = run(cyc, 7)
    assert(t === reference(cyc, 7))
    // past the cycle length the state is a joint fixpoint: rows repeat
    val settled = t.drop(4)
    assert(settled.forall(r => (r._2, r._3, r._4) == (settled.head._2, settled.head._3, settled.head._4)))
  }

  test("PROPERTY: random directed multigraphs match the full-propagation reference") {
    for (seed <- 5L to 8L) {
      val g = GraphGen.randGraph(seed, n = 15, m = 28)
      assert(run(g, 4) === reference(g, 4), s"seed $seed: $g")
    }
  }

  test("self-loops and duplicate edges canonicalize; maxRounds validated") {
    val g = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L))
    assert(run(g, 2) === reference(g, 2))
    intercept[IllegalArgumentException] {
      SccLabels.trajectory(Seq((0L, 1L)).toDF("src", "dst"), 0)
    }
  }
}
