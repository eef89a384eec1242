package graft.operators

import graft.SparkSpec
import graft.sources.TpchGraph
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed fact table") {
    val li = TpchGraph.table(spark, sf, "lineitem")
      .select(col("l_partkey").as("k"), col("l_quantity"))
    val part = TpchGraph.table(spark, sf, "part")
      .select(col("p_partkey").as("k"), col("p_name"))
    val plain = li.join(part, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(li, part, "k", saltFactor = 7)
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("two-phase salted aggregation equals direct groupBy for algebraic aggs") {
    val li = TpchGraph.table(spark, sf, "lineitem")
    val direct = li.groupBy("l_returnflag").agg(round(sum("l_quantity"), 2).as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(li, "l_returnflag", col("l_quantity"), saltFactor = 8)
      .select(col("l_returnflag"), round(col("total"), 2).as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }
}
