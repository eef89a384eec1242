package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-crawl document by how much more likely its hashed
  * n-gram features are under a TARGET distribution (curated reference
  * domains) than under the RAW crawl distribution, then keep the
  * highest-weight documents.
  *
  * Scale shape: the estimator pass reduces the corpus to two
  * `buckets`-sized count vectors (driver-side constants, a few hundred
  * bytes regardless of corpus size — the same broadcast-constant pattern
  * as k-means centroids). The scoring pass is entirely map-side: each
  * document folds over its own bigrams against the literal log-ratio
  * array — no explode, no shuffle, no join. At 100 TB that is one
  * aggregation tree (partial map-side combine on ≤`buckets` keys) plus
  * one linear scan.
  *
  * Cross-engine determinism (repo convention): feature hashing is
  * md5-derived (28-bit prefix, reproducible in any engine), the add-one
  * smoothed log-ratios live on a 1e-6 integer grid, and each document's
  * score is an exact-long sum of those micro-units — accumulation-order
  * independent, so the DuckDB oracle lands on identical 4-dp weights.
  */
object Importance {

  /** Hashed feature bucket of one gram: first 7 hex chars of md5 (28
    * bits, non-negative, so plain `%` is safe) mod `buckets`.
    */
  def featureBucket(gram: Column, buckets: Int): Column =
    (conv(substring(md5(gram), 1, 7), 16, 10).cast("long") % buckets).cast("int")

  /** Word-bigram array of `text` (lowercased whitespace tokens joined by
    * one space); empty for documents with fewer than 2 tokens.
    */
  def bigrams(text: Column): Column = {
    val toks = TextOps.tokens(lower(text))
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))))
  }

  /** Dense per-bucket count vector over exploded features — the
    * driver-side estimator state (`buckets` longs however large the
    * corpus; the aggregation is partial map-side on ≤`buckets` keys).
    */
  private def bucketCounts(feats: DataFrame, buckets: Int): Array[Long] = {
    val arr = Array.fill(buckets)(0L)
    feats.groupBy("b").agg(count(lit(1)).as("c")).collect()
      .foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Importance weights for every document with at least one bigram:
    * `(doc_id, n_feats, logw)` where `logw = Σ_g [log p̂_target(bucket g)
    * − log p̂_raw(bucket g)]` over the document's bigrams, add-one
    * smoothed, 4-dp rounded. `isTarget` marks the rows that define the
    * target distribution (they are also part of the raw distribution —
    * DSIR's raw side is the whole crawl).
    */
  def dsirWeights(df: DataFrame, id: Column, text: Column, isTarget: Column,
                  buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val feats = df.select(id.as("doc_id"), isTarget.as("is_target"),
        explode(bigrams(text)).as("g"))
      .select(col("doc_id"), col("is_target"),
        featureBucket(col("g"), buckets).as("b"))
    val raw = bucketCounts(feats, buckets)
    val tgt = bucketCounts(feats.filter(col("is_target")), buckets)
    val (rTot, tTot) = (raw.sum, tgt.sum)
    // add-one smoothed per-bucket log-ratio on the 1e-6 integer grid
    val lrMicro: Array[Long] = Array.tabulate(buckets) { k =>
      math.round((math.log((tgt(k) + 1.0) / (tTot + buckets)) -
                  math.log((raw(k) + 1.0) / (rTot + buckets))) * 1e6)
    }
    val lrArr = array(lrMicro.map(lit): _*)
    df.select(id.as("doc_id"), bigrams(text).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), size(col("gs")).cast("int").as("n_feats"),
        aggregate(col("gs"), lit(0L),
          (acc, g) => acc + element_at(lrArr, featureBucket(g, buckets) + 1)).as("sm"))
      .select(col("doc_id"), col("n_feats"),
        round(col("sm").cast("double") / 1e6, 4).as("logw"))
  }
}
