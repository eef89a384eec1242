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

  test("a planted hot bucket flips the derived salting decision") {
    import graft.functions.Dedup
    import spark.implicits._
    val dim = 8
    // uniform corpus: ids spread across buckets by their sign pattern
    val rnd = new scala.util.Random(11)
    val uniform = (0 until 256).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    // the plant: 300 near-identical vectors — one LSH bucket per table
    // absorbs all of them, concentrating c² mass on single join keys
    val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val planted = (1000 until 1300).map(i =>
      (i.toLong, base.map(v => v + (i % 7) * 1e-4f).toSeq))
      .toDF("vec_id", "embedding")
    val partitions = 32
    val pUniform = Dedup.lshOccupancyProfile(uniform, col("embedding"), dim)
    val (hotU, _) = Dedup.deriveSaltingThresholds(pUniform, partitions)
    val maxU = pUniform.agg(max(col("max_bucket"))).head().getLong(0)
    // no salting engages on the even corpus: every bucket is under the cutoff
    assert(maxU <= hotU, s"uniform corpus salted: max=$maxU hot=$hotU")

    val pSkewed = Dedup.lshOccupancyProfile(uniform.unionByName(planted),
      col("embedding"), dim)
    val (hotS, shardS) = Dedup.deriveSaltingThresholds(pSkewed, partitions)
    val maxS = pSkewed.agg(max(col("max_bucket"))).head().getLong(0)
    // the planted bucket exceeds the cutoff DERIVED FROM ITS OWN profile
    // (the cutoff grew with total mass, yet the plant out-grew it)
    assert(maxS > hotS, s"planted hot bucket not salted: max=$maxS hot=$hotS")
    assert(shardS >= 1 && maxS / shardS >= 2,
      s"plant must shard into at least 2 pieces: max=$maxS shard=$shardS")

    // and the engaged salted path stays bit-identical to the plain one
    val all = uniform.unionByName(planted)
    val plain = Dedup.embeddingNearDupsLsh(all, col("vec_id"), col("embedding"),
        minCos = 0.8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.embeddingNearDupsLshSalted(all, col("vec_id"), col("embedding"),
        minCos = 0.8, dim = dim, hotThreshold = hotS, shardTarget = shardS)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
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
