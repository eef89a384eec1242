package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def df: DataFrame =
    (1 to 1000).map(i => (i % 7, i, i * 31 % 997)).toDF("g", "id", "score")

  /** The idiom under rewrite: total order (score, id) so results are
    * deterministic and comparable row-for-row.
    */
  private def idiom(k: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(struct($"score", $"id").desc)))
      .filter($"rn" <= k)
      .drop("rn")

  test("rank-filter idiom rewrites to TopKPerGroupExec and matches the window answer") {
    val expected = idiom(3).collect().map(_.toSeq).toSet // rule not yet enabled
    TopKRewrite.enable(spark)
    val rewritten = idiom(3)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), plan) // exec prints without the Exec suffix
    assert(!plan.toLowerCase.contains("window"), plan) // the window op is gone
    assert(rewritten.collect().map(_.toSeq).toSet == expected)
  }

  test("rn = 1 rewrites; ascending order and rn-referencing projects do not") {
    TopKRewrite.enable(spark)
    val top1 = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(struct($"score", $"id").desc)))
      .filter($"rn" === 1).drop("rn")
    assert(top1.queryExecution.executedPlan.toString.contains("TopKPerGroup ["))
    assert(top1.count() == 7)

    val asc = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(struct($"score", $"id"))))
      .filter($"rn" <= 3).drop("rn")
    assert(!asc.queryExecution.executedPlan.toString.contains("TopKPerGroup ["))

    val keepsRn = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(struct($"score", $"id").desc)))
      .filter($"rn" <= 3)
      .select($"g", $"rn")
    assert(!keepsRn.queryExecution.executedPlan.toString.contains("TopKPerGroup ["))
    assert(keepsRn.count() == 21)
  }

  test("global top-k (empty partitionBy) is left to the vanilla plan, and still works") {
    TopKRewrite.enable(spark)
    val global = df.withColumn("rn", row_number().over(
        Window.orderBy(struct($"score", $"id").desc)))
      .filter($"rn" <= 5).drop("rn")
    // ClusteredDistribution(Nil) is invalid — the rewrite must not fire
    assert(!global.queryExecution.executedPlan.toString.contains("TopKPerGroup ["))
    assert(global.count() == 5)
  }
}
