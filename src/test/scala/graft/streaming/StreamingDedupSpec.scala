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
    Seq(r1, r2, r3).foreach(_.release()) // free per-batch checkpoints
  }

  test("crash between bucket and sig writes is repaired by replay (orphan buckets are harmless)") {
    val dir = java.nio.file.Files.createTempDirectory("sdedup2").toString + "/store"
    val b = Seq((1L, docA)).toDF("id", "text")
    val r = StreamingDedup.dedupeBatch(b, col("id"), col("text"), dir)
    r.release()
    // simulate the crash window: buckets written, sigs lost
    val sigsDir = new java.io.File(s"$dir/sigs")
    sigsDir.listFiles().foreach(_.delete()); sigsDir.delete()
    // replay: id 1 is NOT in sigs → re-accepted; duplicate bucket rows
    // merely widen the probe set
    val r2 = StreamingDedup.dedupeBatch(b, col("id"), col("text"), dir)
    assert(r2.fresh.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val b2 = Seq((2L, docA)).toDF("id", "text")
    val r3 = StreamingDedup.dedupeBatch(b2, col("id"), col("text"), dir)
    val d3 = r3.duplicates.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(d3 == Set((2L, 1L))) // dedup still works after the repair
    Seq(r2, r3).foreach(_.release())
  }
}
