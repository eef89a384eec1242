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
}
