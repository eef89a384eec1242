package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for append-only parquet stores (the streaming
  * upsert/dedup stores, the IVF bucket store): every micro-batch append
  * adds a file per touched partition, and at 100 TB a year of
  * micro-batches means millions of KB-sized files — listing time and
  * per-file open overhead eventually dominate scans ("the small-files
  * problem"). Compaction rewrites each partition's accumulated files
  * into one, preserving content exactly.
  */
object Compact {

  /** Rewrite a `partitionBy(partitionCol)`-laid-out store so each
    * partition directory holds ONE file: repartitioning BY the partition
    * column routes every partition's rows to a single task, and the
    * partitionBy writer then emits exactly one file per directory.
    * Content is untouched — only the file layout changes.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              partitionCol: String): Unit =
    spark.read.parquet(inDir)
      .repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(outDir)

  /** Parquet data-file count under a store directory (recursive) — the
    * quantity compaction exists to shrink; used by specs and ops checks.
    */
  def dataFileCount(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .count(p => p.toString.endsWith(".parquet") &&
        java.nio.file.Files.isRegularFile(p))
  }
}
