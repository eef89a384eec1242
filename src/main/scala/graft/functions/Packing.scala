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
}
