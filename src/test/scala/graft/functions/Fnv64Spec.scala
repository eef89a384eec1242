package graft.functions

import graft.SparkSpec
import graft.functions.expressions.Fnv64
import org.apache.spark.sql.functions._

class Fnv64Spec extends SparkSpec {
  import spark.implicits._

  test("codegen'd expression matches the reference Scala implementation") {
    val keys = Seq("customer_1", "region_0", "calyearnode_11650ybp", "", "Salix herbacea")
    val df = keys.toDF("k").select(col("k"), Fnv64.fnv64Col(col("k")).as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == graft.plans.GraphAnalytics.fnv64(r.getString(0)),
        s"mismatch for ${r.getString(0)}")
    }
  }

  test("known FNV-1a test vectors") {
    assert(Fnv64.hash("".getBytes) == 0xcbf29ce484222325L)
    assert(Fnv64.hash("a".getBytes) == 0xaf63dc4c8601ec8cL)
  }

  test("expression is null-safe") {
    val rows = Seq(Some("x"), None).toDF("k")
      .select(Fnv64.fnv64Col(col("k")).as("h")).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("fnv64 is callable from SQL after extension registration") {
    graft.plans.GraftExtensions.registerAll(spark)
    val h = spark.sql("SELECT fnv64('customer_1') AS h").head().getLong(0)
    assert(h == graft.plans.GraphAnalytics.fnv64("customer_1"))
  }

  test("array_dot and winnowing_fp are callable from SQL; winnowing k/w must be literal") {
    graft.plans.GraftExtensions.registerAll(spark)
    val d = spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
    val fps = spark.sql("SELECT winnowing_fp('the quick brown fox jumps', 5, 8) AS f")
      .head().getSeq[Long](0)
    assert(fps.nonEmpty)
    intercept[Exception] { // non-literal k
      spark.sql("SELECT winnowing_fp('abc', CAST(rand() * 5 AS INT), 8)").collect()
    }
  }

  test("expression participates in whole-stage codegen over a real scan") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(Fnv64.fnv64Col(col("text")).as("h"))
    assert(df.filter(col("h").isNotNull).count() > 0)
    // "*(n)" marks operators inside a WholeStageCodegen stage; the
    // projection containing fnv64 must carry it (no codegen fallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [fnv64("), plan)
  }
}
