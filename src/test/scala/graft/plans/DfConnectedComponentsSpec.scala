package graft.plans

import graft.SparkSpec
import graft.sources.TpchGraph
import org.apache.spark.sql.functions._

class DfConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("long chain collapses to one component (log-round contraction, not diameter)") {
    // 0-1-2-...-199: label propagation would need ~200 rounds; star
    // contraction must finish inside the 50-round cap (it needs ~log n)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = DfConnectedComponents.run(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 200)
    assert(cc.values.toSet == Set(0L))
  }

  test("disjoint blobs, self-loops, and duplicate edges resolve to per-blob minima") {
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle
      (20L, 21L), (21L, 20L), (20L, 20L), // pair + dup + self-loop
      (30L, 31L)
    ).toDF("src", "dst")
    val cc = DfConnectedComponents.run(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("PROPERTY: matches a naive union-find on random sparse and dense graphs") {
    val rng = new scala.util.Random(20260813L)
    for ((n, m) <- Seq((40, 15), (40, 60), (12, 40))) { // sparse, ~critical, dense
      val edgeList = (0 until m).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val got = DfConnectedComponents.run(edgeList.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive union-find with path compression, min-id representative
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(v => v -> find(v)).toMap
      assert(got == want, s"n=$n m=$m: df-cc diverged from union-find")
    }
  }

  test("incremental merge is bit-identical to a full recompute, any edge split") {
    val rng = new scala.util.Random(88L)
    // includes the hard cases: delta edges BRIDGING two standing
    // components, delta-only vertices, and untouched components
    val edgeList = (0 until 80).map(_ => (rng.nextInt(50).toLong, rng.nextInt(50).toLong)) ++
      Seq((100L, 101L), (200L, 201L)) // standing comps, one stays untouched
    val bridges = Seq((100L, 200L), (300L, 301L), (301L, 100L)) // merge + fresh ids
    for (cut <- Seq(0, 40, edgeList.size)) { // delta = everything / half / bridges only
      val initial = edgeList.take(cut)
      val delta = edgeList.drop(cut) ++ bridges
      val comp0 = DfConnectedComponents.run(initial.toDF("src", "dst"))
      val got = DfConnectedComponents.merge(comp0, delta.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = DfConnectedComponents.run((edgeList ++ bridges).toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == full, s"cut=$cut")
    }
  }

  test("merge with an empty or all-loop delta returns the standing labeling unchanged") {
    val comp0 = DfConnectedComponents.run(Seq((1L, 2L), (5L, 6L)).toDF("src", "dst"))
    val want = comp0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val empty = DfConnectedComponents.merge(comp0,
        Seq.empty[(Long, Long)].toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(empty == want)
    // self-loops carry no connectivity and introduce no vertices
    val loops = DfConnectedComponents.merge(comp0,
        Seq((2L, 2L), (99L, 99L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loops == want)
  }

  test("matches GraphX connectedComponents on the TPC-H subgraph, including isolated vertices") {
    val g = TpchGraph.graph(spark, sf)
    val rels = Seq("InNation", "InRegion")
    val types = Seq("region", "nation", "customer", "supplier")
    val df = DfConnectedComponents.connectedComponents(spark, g, rels, types)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gx = GraphAnalytics.connectedComponents(spark, g, rels, types)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // GraphX drops nothing here (all vertices touched by edges), and both
    // label components by minimum vertex id → maps must be identical
    assert(df == gx)
  }
}
