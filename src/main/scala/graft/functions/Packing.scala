package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining-data preparation: documents are
  * concatenated in a deterministic per-shard order and the resulting
  * token stream is cut into fixed-length context windows (GPT-style
  * pack-and-chunk — documents may span a window boundary, so no window
  * carries padding waste). The output maps every document to its token
  * offset and the window range it occupies, which is what a downstream
  * batch assembler needs to materialize training examples.
  *
  * Scale shape: the prefix sum is windowed PER SHARD (`partitionBy`),
  * so packing is data-parallel across shards — exactly how a 100 TB
  * corpus is laid out (per-source / per-file shards). There is no global
  * ordering anywhere; one shuffle on the shard key, then a sorted
  * within-partition pass.
  */
object Packing {

  /** Per-document packing assignment: `(doc_id, shard, n_tokens,
    * tok_start, win_start, win_end)` where `tok_start` is the document's
    * offset in its shard's token stream and windows are
    * `floor(offset / contextLen)`. A zero-token document occupies (only)
    * its start window.
    */
  def packSequences(df: DataFrame, id: Column, text: Column, shard: Column,
                    contextLen: Int): DataFrame = {
    require(contextLen > 0, "packSequences needs a positive context length")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(id.as("doc_id"), shard.as("shard"),
        TextOps.tokenCount(text).cast("int").as("n_tokens"))
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).cast("long"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("tok_start"),
        floor(col("tok_start") / contextLen).cast("long").as("win_start"),
        floor((col("tok_start") + greatest(col("n_tokens"), lit(1)) - 1) / contextLen)
          .cast("long").as("win_end"))
  }

  /** Per-document overlapping chunk windows (RAG / context-window
    * chunking): token ranges `[i·stride, min(i·stride + chunkLen, n))`
    * covering every token, with `chunkLen − stride` tokens of overlap
    * between consecutive chunks. Documents with no tokens produce no
    * chunks; a document at or under `chunkLen` produces exactly one.
    *
    * Entirely map-side: one `explode` over a per-row chunk-count
    * sequence — no shuffle at any corpus size. (The no-token filter is
    * the cheap `rlike` scan-predicate form — see
    * [[Corpus.repetitionSignals]] for why `size(tokens) > 0` is a trap.)
    */
  def chunkWindows(df: DataFrame, id: Column, text: Column,
                   chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
      s"chunkWindows needs 0 < stride <= chunkLen, got $stride/$chunkLen")
    df.filter(text.rlike("\\S"))
      .select(id.as("doc_id"), TextOps.tokenCount(text).cast("int").as("n_tokens"))
      .withColumn("n_chunks",
        when(col("n_tokens") <= chunkLen, lit(1))
          .otherwise(ceil((col("n_tokens") - chunkLen).cast("double") / stride)
            .cast("int") + 1))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        (col("chunk_id") * stride).cast("int").as("tok_start"),
        least(col("chunk_id") * stride + chunkLen, col("n_tokens")).cast("int").as("tok_end"))
  }

  /** Content-defined chunking (the rsync/LBFS boundary trick): cut after
    * character position `p` whenever the hash of the k-gram ENDING at `p`
    * is ≡ 0 (mod `divisor`), so boundaries are a function of local
    * CONTENT, not offsets. An insertion early in a document shifts every
    * fixed-window chunk ([[chunkWindows]]) but leaves all CDC boundaries
    * past the edit's k-gram neighborhood untouched — which is what makes
    * chunk-level dedup robust to near-duplicate documents with
    * insertions. Expected chunk length ≈ `divisor` characters; chunks
    * tile the document exactly (concatenating them reproduces the text).
    *
    * The gram hash is the engine's portable md5-prefix idiom, so any
    * engine reproduces the boundaries bit-for-bit. Production CDC adds
    * min/max chunk-size guards; that is a sequential per-document
    * min-gap scan over the same boundary set, deliberately left out here
    * to keep the operator stateless-per-position and oracle-exact.
    *
    * Entirely map-side (per-row array expressions + one explode) — no
    * shuffle at any corpus size.
    *
    * Returns `(doc_id, chunk_id, c_start, c_len, fp)` with 1-based
    * `c_start` and `fp = md5(chunk text)`.
    */
  def cdcChunks(df: DataFrame, id: Column, text: Column,
                k: Int = 8, divisor: Int = 64): DataFrame = {
    require(k >= 1 && divisor >= 1,
      s"cdcChunks needs positive k and divisor, got $k/$divisor")
    val t = df.filter(length(text) >= 1)
      .select(id.as("doc_id"), text.as("txt"))
    // cut points via the codegen'd CdcCuts expression — one JVM loop per
    // row; the array-expression formulation (filter over sequence() with
    // an md5 per position) evaluated an interpreted lambda per character
    // and was ~20x slower at sf0.1 while producing identical cuts
    t.withColumn("cuts",
        graft.functions.expressions.CdcCuts.cutsCol(col("txt"), k, divisor))
      .select(col("doc_id"), col("txt"),
        posexplode(zip_with(
          slice(col("cuts"), lit(1), size(col("cuts")) - 1),
          slice(col("cuts"), lit(2), size(col("cuts")) - 1),
          (s, e) => struct(s.as("s"), e.as("e")))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        col("col.s").as("c_start"),
        (col("col.e") - col("col.s")).as("c_len"),
        md5(col("txt").substr(col("col.s"), col("col.e") - col("col.s"))).as("fp"))
  }
}
