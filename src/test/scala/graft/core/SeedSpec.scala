package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeedSpec extends SparkSpec {

  test("seed graph matches reference invariants (S14, ref Seed.fs:48-99)") {
    val g = Seed.seedGraph(spark)
    val byType = g.nodes.groupBy("nodeType").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("calyearnode") == 14073L)      // −72..14000
    assert(byType("biodiversitydimensionnode") == 6L)
    assert(byType("qualitativelabelnode") == 1L)
    assert(byType("qualitativelabeloutofscopenode") == 1L) // J9 routing target
    assert(byType("taxonnode") == 1L)
    assert(g.nodes.count() == 14082L)

    // Next sequence edges: one per consecutive year pair, forward in time
    val withNext = Seed.seedGraph(spark, withNextEdges = true)
    val next = withNext.edges.filter(_.relType == "Next")
    assert(next.count() == 14072L) // −71..14000 each point to year−1
    assert(next.filter(e => e.src == "calyearnode_11650ybp").head().dst == "calyearnode_11649ybp")
    assert(next.filter(e => e.dst == "calyearnode_-72ybp").head().src == "calyearnode_-71ybp")

    val extents = g.edges.collect().map(e => e.relType -> e.dst).toMap
    assert(extents("EarliestTime") == "calyearnode_11650ybp")
    assert(extents("LatestTime") == "calyearnode_0ybp")
  }

  test("year dimension bounds and key format") {
    val years = Seed.yearDimension(spark)
    val keys = years.select(min("key"), max("key")).head()
    assert(years.count() == 14073)
    assert(years.filter(col("key") === "calyearnode_-72ybp").count() == 1)
    assert(years.filter(col("key") === "calyearnode_14000ybp").count() == 1)
  }

  test("containsEdges materializes one edge per contained year, clipped to seed bounds") {
    import spark.implicits._
    val extents = Seq(
      ("qualitativelabelnode_tiny", 5, 3),          // 3,4,5
      ("qualitativelabelnode_deep", 20000, 13998)   // clipped to 13998..14000
    ).toDF("labelKey", "earliestBP", "latestBP")
    val edges = Seed.containsEdges(extents).collect()
    assert(edges.forall(_.relType == "Contains"))
    val byLabel = edges.groupBy(_.src).view.mapValues(_.map(_.dst).sorted.toSeq).toMap
    assert(byLabel("qualitativelabelnode_tiny") ==
      Seq("calyearnode_3ybp", "calyearnode_4ybp", "calyearnode_5ybp"))
    assert(byLabel("qualitativelabelnode_deep") ==
      Seq("calyearnode_13998ybp", "calyearnode_13999ybp", "calyearnode_14000ybp"))
  }

  test("containsEdges drops extents entirely outside the seeded year window") {
    import spark.implicits._
    // clipping an all-outside extent would otherwise hand sequence() a
    // start > stop pair, which silently steps -1 and emits edges to
    // year nodes that don't exist
    val extents = Seq(
      ("qualitativelabelnode_future", -100, -200),   // entirely after MinYearBP
      ("qualitativelabelnode_archean", 99999, 88888) // entirely before MaxYearBP
    ).toDF("labelKey", "earliestBP", "latestBP")
    assert(Seed.containsEdges(extents).count() == 0L)
  }
}
