package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TypedFoldsSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator fold equals the untyped sum(when) form on the same facts") {
    val facts = Seq(
      TypedFolds.OrderFacts(400000.0, "F"),
      TypedFolds.OrderFacts(100.0, "O"),
      TypedFolds.OrderFacts(300001.0, "O"),
      TypedFolds.OrderFacts(5.0, "P"),
      TypedFolds.OrderFacts(300000.0, "F")) // boundary: strict >
    val ds = facts.toDS().repartition(3) // force reduce+merge across partitions
    val typed = ds.select(TypedFolds.orderStats.toColumn).collect()(0)
    assert(typed == TypedFolds.FoldCounts(2L, 2L, 2L, 1L), typed.toString)
    val untyped = ds.toDF().agg(
        sum(when(col("totalprice") > 300000, 1L).otherwise(0L)).as("hv"),
        sum(when(col("orderstatus") === "F", 1L).otherwise(0L)).as("f"),
        sum(when(col("orderstatus") === "O", 1L).otherwise(0L)).as("o"),
        sum(when(col("orderstatus") === "P", 1L).otherwise(0L)).as("p"))
      .collect()(0)
    assert((typed.high_value, typed.n_f, typed.n_o, typed.n_p) ==
      (untyped.getLong(0), untyped.getLong(1), untyped.getLong(2), untyped.getLong(3)))
  }
}
