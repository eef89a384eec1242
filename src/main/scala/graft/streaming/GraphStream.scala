package graft.streaming

import graft.model.NodeRow
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming graph ingest (the SURVEY §2.9 extension shape): an
  * append-only stream of node rows upserted into the parquet-backed
  * nodes store via `foreachBatch` + key-dedup — the reference's
  * idempotent insert (M2, `Graph.fs:72-79`) applied per micro-batch.
  *
  * Idempotence is per-key, so replayed batches (at-least-once delivery)
  * converge to the same store; checkpointing gives exactly-once batch
  * ids. Edges follow the identical pattern keyed on the full tuple.
  */
object GraphStream {

  /** One micro-batch upsert: skip rows whose key already exists in the
    * store, append the rest partitioned by nodeType.
    */
  def upsertBatch(batch: Dataset[NodeRow], storeDir: String): Unit = {
    val spark = batch.sparkSession
    val path = s"$storeDir/nodes"
    // existence check through the Hadoop FS API — java.io.File is always
    // false for hdfs://, s3a://, … and would silently disable the dedup.
    // Check for committed DATA files, not the directory: a failed first
    // write can leave an empty dir whose schema inference would throw on
    // every later batch (a crash loop the stream can never exit).
    // The writer uses partitionBy(nodeType), so data files live one level
    // down (nodes/nodeType=X/part-*.parquet); Hadoop globs don't cross path
    // components, so the glob must include the partition directory.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(hPath) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(path, "*/*.parquet")).nonEmpty
    val existingKeys =
      // schema pinned from the batch (the store is written by this
      // object): skips per-batch footer re-inference
      if (hasData) spark.read.schema(batch.schema).parquet(path).select("key")
      else spark.range(0).select(col("id").cast("string").as("key"))
    val fresh = batch
      .dropDuplicates("key")
      .join(existingKeys, Seq("key"), "left_anti")
    fresh.write.mode(SaveMode.Append).partitionBy("nodeType").parquet(path)
  }

  /** Attach the upsert sink to a node-row stream. */
  def upsertStream(nodes: Dataset[NodeRow], storeDir: String, checkpointDir: String): StreamingQuery =
    nodes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[NodeRow], _: Long) =>
        upsertBatch(batch, storeDir)
      }
      .start()

  def loadStore(spark: SparkSession, storeDir: String): Dataset[NodeRow] = {
    import spark.implicits._
    spark.read.parquet(s"$storeDir/nodes")
      .select("key", "nodeType", "prettyName", "payload").as[NodeRow]
  }
}
