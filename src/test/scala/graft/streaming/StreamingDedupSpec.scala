package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docB = "completely different content about palaeo biodiversity proxies and pollen records"
  private val docC = "yet another unrelated text concerning spark query engines and shuffle planning"

  test("micro-batches dedupe against the store and within the batch; replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("sdedup").toString + "/store"

    // batch 1: doc 3 is an exact dup of doc 1 (intra-batch)
    val b1 = Seq((1L, docA), (2L, docB), (3L, docA)).toDF("id", "text")
    val r1 = StreamingDedup.dedupeBatch(b1, col("id"), col("text"), dir)
    assert(r1.fresh.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val d1 = r1.duplicates.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d1 == Set((3L, 1L)))

    // batch 2: doc 4 duplicates stored doc 2; doc 5 is new
    val b2 = Seq((4L, docB), (5L, docC)).toDF("id", "text")
    val r2 = StreamingDedup.dedupeBatch(b2, col("id"), col("text"), dir)
    assert(r2.fresh.collect().map(_.getLong(0)).toSeq == Seq(5L))
    val d2 = r2.duplicates.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d2 == Set((4L, 2L)))

    // replay of batch 2 (at-least-once delivery): nothing new enters the
    // store, the duplicate verdicts are unchanged, and 5 now reads as dup
    // of its stored self
    val r3 = StreamingDedup.dedupeBatch(b2, col("id"), col("text"), dir)
    assert(r3.fresh.isEmpty)
    val stored = spark.read.parquet(s"$dir/sigs").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(stored == Seq(1L, 2L, 5L))
  }
}
