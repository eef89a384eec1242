package graft.functions

import graft.plans.TopKPerGroup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (KMV / bottom-k; Beyer et al., "On
  * Synopses for Distinct-Value Estimation Under Multiset Operations",
  * SIGMOD '07).
  *
  * KMV keeps the k smallest distinct hash values of a set; the k-th
  * minimum h₍k₎ estimates cardinality as (k−1)·M ÷ h₍k₎ over hash space
  * M. The sketch is MERGEABLE — the bottom-k of a union is computable
  * from per-partition bottom-k's — which is exactly how the
  * [[TopKPerGroup]] operator executes it: per-partition heaps map-side,
  * one k-row-per-group merge at the reducer. At 100 TB that is the
  * difference between shuffling every distinct hash and shuffling k
  * rows per group.
  *
  * Everything is exact integer arithmetic over the repo's engine-portable
  * 28-bit [[Dedup.gramHash]] (first 7 hex chars of md5), so the estimate
  * is bit-identical on any engine with md5 — no HLL register/float drift
  * (Spark's own approx_count_distinct HLL++ can never pass a cross-engine
  * hash gate).
  */
object Sketch {

  /** Hash-space size of [[Dedup.gramHash]]: 7 hex chars = 28 bits. */
  val GramHashSpace: Long = 1L << 28

  /** Per-group distinct-value estimate: `(group, n_exact, kmv_est)`.
    * `n_exact` is the exact distinct-HASH count (the ground truth the
    * estimate approximates; 28-bit collisions conflate both the same
    * way, keeping the pair self-consistent). Groups with fewer than `k`
    * distinct values report themselves exactly — the standard KMV
    * small-set rule. Expected relative error ≈ 1/√(k−2).
    */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2: $k")
    val hashes = df.select(group.as("grp"), Dedup.gramHash(value).as("h")).distinct()
    // bottom-k per group = topK on the negated hash (custom operator:
    // per-partition heaps, k rows per group cross the shuffle)
    val bottomK = TopKPerGroup.topK(hashes, Seq(col("grp")), -col("h"), k)
    val kth = bottomK.groupBy("grp").agg(max(col("h")).as("hk"))
    val exact = hashes.groupBy("grp").agg(count(lit(1)).as("n_exact"))
    exact.join(broadcast(kth), "grp")
      .select(col("grp"), col("n_exact"),
        when(col("n_exact") < k, col("n_exact"))
          .otherwise(expr(s"${(k - 1).toLong * GramHashSpace}L div greatest(hk, 1L)"))
          .as("kmv_est"))
  }
}
