package graft.core

import graft.model.{EdgeRow, NodeRow}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S1–S6 — storage layer.
  *
  * The reference persists one JSON file per graph atom plus a JSON index
  * (`Storage.fs:32-56,124-154`). That layout is pathological at scale (one
  * file per node); the Spark-native layout is two parquet datasets
  * partitioned by `nodeType` — the same partition key the reference groups
  * by on every load (`Storage.fs:188-193,211-213`) — so type-filtered scans
  * prune to a directory, and key probes push a predicate into one partition.
  */
object GraphIO {

  /** S5/S6 — persist the graph: nodes and edges parquet, partitioned by
    * `nodeType` / `relType`, plus the sorted-distinct index (reference
    * `Storage.fs:160-171`).
    */
  def save(g: GraphState, dir: String): Unit = {
    g.nodes.write.mode(SaveMode.Overwrite).partitionBy("nodeType").parquet(s"$dir/nodes")
    g.edges.write.mode(SaveMode.Overwrite).partitionBy("relType").parquet(s"$dir/edges")
    g.index().coalesce(1).write.mode(SaveMode.Overwrite).json(s"$dir/atom-index")
  }

  /** S1/S2 — load a persisted graph. */
  def load(spark: SparkSession, dir: String): GraphState = {
    import spark.implicits._
    val nodes = spark.read.parquet(s"$dir/nodes")
      .select("key", "nodeType", "prettyName", "payload").as[NodeRow]
    val edges = spark.read.parquet(s"$dir/edges")
      .select("src", "dst", "weight", "relType", "relPayload").as[EdgeRow]
    GraphState(nodes, edges)
  }

  /** Bucketed table layout for co-located joins: nodes bucketed by
    * `key`, edges bucketed by `src`, same bucket count — a sort-merge
    * join of `edges.src == nodes.key` then needs NO shuffle on either
    * side (the 100 TB answer to repeated traversal joins; asserted in
    * BucketedIOSpec). Requires a catalog table (`saveAsTable`), not a
    * bare path.
    */
  def saveBucketed(g: GraphState, buckets: Int, prefix: String = "graft"): Unit = {
    val spark = g.nodes.sparkSession
    // drop any prior table AND its on-disk location: with an in-memory
    // catalog, files from a previous session outlive the table entry and
    // Overwrite then fails with LOCATION_ALREADY_EXISTS
    Seq(s"${prefix}_nodes", s"${prefix}_edges").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = java.nio.file.Paths.get(warehouse, t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    g.nodes.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "key").sortBy("key")
      .saveAsTable(s"${prefix}_nodes")
    g.edges.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(s"${prefix}_edges")
  }

  def loadBucketed(spark: SparkSession, prefix: String = "graft"): GraphState = {
    import spark.implicits._
    GraphState(
      spark.table(s"${prefix}_nodes").as[NodeRow],
      spark.table(s"${prefix}_edges").as[EdgeRow])
  }

  /** S7 — integrity sweep (reference `Storage.fs:175-185`): recompute
    * display names map-side and report rows whose stored `prettyName`
    * drifted. Naturally parallel — the reference needed
    * `Array.Parallel.map` for this; here it is one narrow stage.
    */
  def staleIndexRows(g: GraphState, recompute: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    g.nodes
      .withColumn("recomputed", recompute)
      .filter(!(col("recomputed") <=> col("prettyName"))) // null-safe: null↔value IS drift
      .select("key", "nodeType", "prettyName", "recomputed")

  /** Small-file compaction for append-heavy stores (streaming upserts —
    * [[graft.streaming.GraphStream]], [[graft.streaming.StreamingDedup]] —
    * add one file set per micro-batch; thousands of tiny parquet files
    * destroy scan throughput via per-file open/footer costs). Rewrites
    * the dataset into ~`targetFileMB` files sized from the actual on-disk
    * bytes. Returns (filesBefore, filesAfter).
    *
    * Concurrency contract: writers MUST be quiesced for the duration —
    * files appended after the rewrite reads the dataset would be deleted
    * with the old files (plain parquet directories have no transaction
    * log; a table format is the at-scale answer for online compaction).
    * The delete+rename pair is also not crash-atomic: on failure between
    * the two, the compacted data survives at `<path>.compact-tmp` for
    * manual recovery.
    *
    * `partitionBy` must name the dataset's partition columns (e.g.
    * `nodeType` for the nodes store) — compacting a partitioned layout
    * flat would strip partition pruning and collide with later
    * partitioned appends.
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 128,
              partitionBy: Seq[String] = Nil): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(hPath), s"no dataset at $path")
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = parquetFiles(hPath)
    val bytes = before.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(bytes / (targetFileMB * 1024.0 * 1024.0)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    val df = spark.read.parquet(path)
    val writer =
      (if (partitionBy.nonEmpty)
         df.repartition(targetFiles, partitionBy.map(col): _*).write.partitionBy(partitionBy: _*)
       else df.repartition(targetFiles).write)
        .mode(SaveMode.Overwrite)
    writer.parquet(tmp.toString)
    val after = parquetFiles(tmp).size
    fs.delete(hPath, true)
    require(fs.rename(tmp, hPath), s"rename $tmp -> $hPath failed")
    (before.size, after)
  }
}
