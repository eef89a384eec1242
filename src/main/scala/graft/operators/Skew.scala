package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY "spill-aware" posture):
  * salt the skewed (large) side into `saltFactor` sub-keys and replicate
  * the small side across all salts, so one hot key spreads over
  * `saltFactor` tasks instead of one straggler.
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool for aggregation skew and for joins AQE cannot split (e.g.
  * broadcast-ineligible dimension with one hot key).
  */
object Skew {

  /** Deterministic per-row salt: a hash of ALL input columns, so a
    * recomputed task after executor loss assigns the same salts
    * (`monotonically_increasing_id` depends on partition layout and
    * in-partition order — nondeterministic under stage retry, which
    * forces Spark to roll back or abort shuffled stages). Identical rows
    * share a salt; they are duplicates, so the spread is unaffected.
    */
  private def rowSalt(df: DataFrame, saltFactor: Int): Column = {
    require(!df.columns.contains("_salt"), "input already has a _salt column")
    pmod(xxhash64(df.columns.map(col): _*), lit(saltFactor.toLong)).cast("int")
  }

  /** Equi-join `large ⋈ small` on `key`, salted. Result equals the plain
    * inner join (verified by SkewSpec).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val salted = large.withColumn("_salt", rowSalt(large, saltFactor))
    val replicated = small.withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. For algebraic aggregates this equals
    * the direct groupBy while bounding any single task's share of a hot
    * key to 1/saltFactor.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: Column, saltFactor: Int): DataFrame =
    df.withColumn("_salt", rowSalt(df, saltFactor))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("total"))
}
