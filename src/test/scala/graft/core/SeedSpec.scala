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
}
