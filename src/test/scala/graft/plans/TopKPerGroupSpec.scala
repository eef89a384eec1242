package graft.plans

import graft.SparkSpec
import graft.sources.TpchGraph
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  test("custom operator equals the window row_number formulation") {
    val o = TpchGraph.table(spark, sf, "orders")
    val viaOp = TopKPerGroup.topK(o, Seq(col("o_custkey")),
        struct(col("o_totalprice"), -col("o_orderkey")), k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(viaOp == viaWindow)
    assert(viaOp.nonEmpty)
  }

  test("plans as two-phase heap exec with no sort and no window") {
    val o = TpchGraph.table(spark, sf, "orders")
    val df = TopKPerGroup.topK(o, Seq(col("o_custkey")),
      struct(col("o_totalprice"), -col("o_orderkey")), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroupExec?".r.findAllIn(plan).isEmpty || plan.contains("TopKPerGroup"), plan)
    assert(plan.split("TopKPerGroup").length >= 3, s"expected partial+final:\n$plan")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("k larger than any group returns every row") {
    val o = TpchGraph.table(spark, sf, "orders").filter(col("o_custkey") < 5)
    val n = o.count()
    val all = TopKPerGroup.topK(o, Seq(col("o_custkey")), col("o_totalprice"), k = 100000)
    assert(all.count() == n)
  }
}
