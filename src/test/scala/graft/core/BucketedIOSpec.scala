package graft.core

import graft.SparkSpec
import graft.sources.TpchGraph
import org.apache.spark.sql.functions._

class BucketedIOSpec extends SparkSpec {

  test("bucketed nodes/edges join without shuffling the bucketed sides") {
    val g = GraphState(
      TpchGraph.nodes(spark, sf, withPayload = false),
      TpchGraph.edges(spark, sf, withPayload = false))
    GraphIO.saveBucketed(g, buckets = 4, prefix = "graft_test")
    val b = GraphIO.loadBucketed(spark, prefix = "graft_test")

    val joined = b.edges.filter(col("relType") === "PlacedBy")
      .join(b.nodes, b.edges("src") === b.nodes("key"))
    val n = joined.count()
    assert(n > 0)

    // co-located layout: the executed plan must not exchange either side
    // (bucket pruning makes the sort-merge join shuffle-free)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"), plan)

    // round trip preserves content
    assert(b.nodes.count() == g.nodes.count())
    assert(b.edges.count() == g.edges.count())
  }
}
