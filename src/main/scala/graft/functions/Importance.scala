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
  * `buckets`-sized count vectors in ONE aggregate job (driver-side
  * constants, a few hundred bytes regardless of corpus size — the same
  * broadcast-constant pattern as k-means centroids). The scoring pass
  * joins nothing: documents partial-aggregate `(count, Σ lr_micro)`
  * map-side against the literal log-ratio array, so the only shuffle
  * carries one thin row per document per partition — and everything
  * stays inside whole-stage codegen (see [[dsirWeights]] for why the
  * shuffle-free per-doc HOF fold is the wrong trade).
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

  /** Word-bigram array from an ALREADY-MATERIALIZED token array column;
    * empty for documents with fewer than 2 tokens. The guard, the
    * sequence bound, and the pair lambda reference `ts` three times —
    * callers must stage the tokenization in its own projection (as
    * [[dsirWeights]] does) or every reference re-splits the text
    * (measured 3× the explode cost at sf0.1; same trap
    * [[Corpus.topNgrams]] documents).
    */
  def bigramsFromTokens(ts: Column): Column =
    when(size(ts) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ts) - 2),
        i => concat(element_at(ts, i + 1), lit(" "), element_at(ts, i + 2))))

  /** Word-bigram array of `text` (lowercased whitespace tokens joined by
    * one space) — convenience form for single-use expressions; hot paths
    * should stage tokens and use [[bigramsFromTokens]].
    */
  def bigrams(text: Column): Column =
    bigramsFromTokens(TextOps.tokens(lower(text)))

  /** Importance weights for every document with at least one bigram:
    * `(doc_id, n_feats, logw_micro)` where `logw_micro` is the EXACT
    * integer sum of per-bucket micro-scaled log-ratios — `Σ_g
    * round((log p̂_target(bucket g) − log p̂_raw(bucket g)) · 10⁶)` over
    * the document's bigrams, add-one smoothed. Integer micros end to
    * end: each bucket's log-ratio is rounded once, so the per-document
    * sum is exact and partition-order-invariant (no float accumulation
    * drift). `isTarget` marks the rows that define the
    * target distribution (they are also part of the raw distribution —
    * DSIR's raw side is the whole crawl).
    *
    * Two corpus passes over the same exploded-feature plan, both fully
    * codegen'd: the estimator collapses the corpus to ONE `buckets`-row
    * aggregate carrying the raw and target counts together (a single
    * job, partial map-side combine on ≤`buckets` keys), and the scoring
    * pass partial-aggregates `(count, Σ lr_micro)` per document before
    * the doc-keyed shuffle — the shuffle carries one thin row per
    * document per partition, never the grams. (A per-document
    * higher-order `aggregate` fold would avoid that shuffle entirely,
    * but HOF lambdas evaluate INTERPRETED — hashing every bigram
    * outside codegen measured 38 s where this plan takes under a
    * second at sf0.1.)
    */
  def dsirWeights(df: DataFrame, id: Column, text: Column, isTarget: Column,
                  buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    // tokenize ONCE into a surviving child projection of the Generate
    val staged = df.select(id.as("doc_id"), isTarget.as("is_target"),
      TextOps.tokens(lower(text)).as("ts"))
    val feats = staged.select(col("doc_id"), col("is_target"),
        explode(bigramsFromTokens(col("ts"))).as("g"))
      .select(col("doc_id"), col("is_target"),
        featureBucket(col("g"), buckets).as("b"))
    // one estimator job: both count vectors from a single aggregate
    val raw = Array.fill(buckets)(0L)
    val tgt = Array.fill(buckets)(0L)
    feats.groupBy("b")
      .agg(count(lit(1)).as("c_raw"),
           count(when(col("is_target"), 1)).as("c_tgt"))
      .collect() // ≤`buckets` rows — broadcast-constant scale
      .foreach { r => raw(r.getInt(0)) = r.getLong(1); tgt(r.getInt(0)) = r.getLong(2) }
    val (rTot, tTot) = (raw.sum, tgt.sum)
    // add-one smoothed per-bucket log-ratio on the 1e-6 integer grid
    val lrMicro: Array[Long] = Array.tabulate(buckets) { k =>
      math.round((math.log((tgt(k) + 1.0) / (tTot + buckets)) -
                  math.log((raw(k) + 1.0) / (rTot + buckets))) * 1e6)
    }
    val lrArr = array(lrMicro.map(lit): _*)
    feats.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_feats"),
           sum(element_at(lrArr, col("b") + 1)).as("sm"))
      // exact integer micros (the p86 weight_micro pattern): the earlier
      // round(sm/1e6, 4) double output hit a decimal half-way knife edge
      // at sf0.1 (sm = ...150 micros → 0.xxxx5, which Spark's BigDecimal
      // HALF_UP and an oracle's double-arithmetic round resolve
      // differently). Integer micros carry full precision and render
      // identically on every engine.
      .select(col("doc_id"), col("n_feats"),
        col("sm").cast("long").as("logw_micro"))
  }
}
