package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent MAINTAINED-ARTIFACT store: derived graph tables (ranked
  * adjacency, weighted co-purchase edges, transition counts) written once
  * as BUCKETED parquet and re-read by every later consumer — the durable
  * form of the process-local `TpchGraph` memos, which vanish on restart
  * and therefore made "built once, reused across exports" a posture
  * rather than an API.
  *
  * Deployment shape (100 TB posture): at scale these artifacts live as
  * bucketed tables in the lake, refreshed when their source tables
  * change; consumers join/group on the bucket column WITHOUT a shuffle
  * (bucketed scan). This store reproduces exactly that: `bucketBy` +
  * `sortBy` on the artifact's join key via `saveAsTable` (bucket
  * metadata lives in the catalog, not the files), an external LOCATION
  * under the store root, and a SOURCE FINGERPRINT invalidation rule —
  * the artifact is rebuilt iff the source parquet footprint (file names,
  * sizes, mtimes) changed, the same freshness contract a lakehouse
  * refresh job keys on.
  *
  * Store root: `SPARK_GRAFT_ARTIFACTS` (a real deployment points this at
  * durable storage); otherwise a per-process scratch dir — tests and
  * bench runs then exercise the full write-bucketed + read-back path
  * with automatic cleanup.
  */
object ArtifactStore {

  private lazy val root: String =
    sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS", TempStores.scratchDir("graft-artifacts-"))

  /** Fingerprint of the artifact's SOURCE tables: relative path, size,
    * and mtime of every data file under each source dir — the full tree
    * ([[java.nio.file.Files.walk]]), so a partitioned/nested layout's
    * in-place file rewrite (which may not touch the parent dir's mtime)
    * still invalidates. Cheap (a directory walk — no data read) and
    * exactly the signal an incremental refresh job keys on: any rewrite,
    * compaction, or append changes it.
    */
  def sourceFingerprint(sfDir: String, tables: Seq[String]): String = {
    val parts = tables.sorted.flatMap { t =>
      val p = java.nio.file.Paths.get(sfDir, s"$t.parquet")
      if (!java.nio.file.Files.exists(p)) Seq(s"$t:absent")
      else if (java.nio.file.Files.isDirectory(p)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(p)
        try walk.iterator().asScala.toSeq
          .filter(java.nio.file.Files.isRegularFile(_))
          .filterNot(_.getFileName.toString.startsWith("_"))
          .sortBy(_.toString)
          .map(f => s"${p.relativize(f)}:${java.nio.file.Files.size(f)}:" +
            s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}")
        finally walk.close()
      } else Seq(s"${p.getFileName}:${java.nio.file.Files.size(p)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest((sfDir + "|" + parts.mkString("|")).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def metaPath(name: String) = java.nio.file.Paths.get(root, s"$name.meta")
  private def dataPath(name: String) = java.nio.file.Paths.get(root, name)

  /** Catalog-safe table name for an artifact. */
  private def tableName(name: String) = s"graft_art_${name.replaceAll("[^A-Za-z0-9_]", "_")}"

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Read the artifact from the store if its recorded source fingerprint
    * is current; otherwise (re)build it, write it bucketed, and read it
    * back. The returned DataFrame ALWAYS scans the store (never the
    * build plan), so every consumer — including the first after a
    * rebuild — exercises the same bucketed read path the deployment
    * would. Concurrency: `synchronized` serializes threads of THIS JVM;
    * an OS file lock (held only around the stale→rebuild window)
    * serializes PROCESSES sharing one `SPARK_GRAFT_ARTIFACTS` root —
    * two jobs racing the same refresh would otherwise interleave
    * delete/write on the same directory. Currency is RE-CHECKED after
    * the lock is granted: the usual outcome of losing the race is that
    * the winner already rebuilt, and the loser must read, not rebuild
    * again.
    */
  def bucketed(spark: SparkSession, name: String, fingerprint: String,
               bucketCol: String, nBuckets: Int)(build: => DataFrame): DataFrame =
    synchronized {
      val tbl = tableName(name)
      val meta = metaPath(name)
      val data = dataPath(name)
      // staleness covers the BUCKET SPEC, not just the sources: files
      // written under an old (bucketCol, nBuckets) re-registered with a
      // new spec would let Spark elide exchanges the files don't satisfy
      // — silently wrong joins/aggregates on the bucket column. A spec
      // mismatch is a rebuild, same as a source change.
      def isCurrent =
        java.nio.file.Files.exists(meta) && java.nio.file.Files.exists(data) && {
          val lines = java.nio.file.Files.readAllLines(meta)
          lines.size >= 3 && lines.get(0) == fingerprint &&
            lines.get(2) == s"$bucketCol:$nBuckets"
        }
      def register(): Unit =
        if (!spark.catalog.tableExists(tbl)) {
          // a fresh process inherits the files but not the in-memory
          // catalog entry; the stored DDL carries schema + bucket spec
          val ddl = java.nio.file.Files.readAllLines(meta).get(1)
          spark.sql(s"""CREATE TABLE $tbl ($ddl) USING PARQUET
            CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $nBuckets BUCKETS
            LOCATION '${data.toUri}'""")
        }
      def rebuild(): Unit = {
        val df = build
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        java.nio.file.Files.deleteIfExists(meta)
        if (java.nio.file.Files.exists(data)) deleteRecursively(data.toFile)
        df.write.format("parquet")
          .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
          .option("path", data.toString)
          .mode("overwrite")
          .saveAsTable(tbl)
        java.nio.file.Files.createDirectories(meta.getParent)
        java.nio.file.Files.write(meta,
          (fingerprint + "\n" + df.schema.toDDL + "\n" +
            s"$bucketCol:$nBuckets" + "\n").getBytes("UTF-8"))
      }
      if (isCurrent) register()
      else {
        val lockPath = java.nio.file.Paths.get(root, s"$name.lock")
        java.nio.file.Files.createDirectories(lockPath.getParent)
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock() // blocks until the other process's refresh completes
          try {
            if (isCurrent) register() // loser of the race: winner already rebuilt
            else rebuild()
          } finally lock.release()
        } finally ch.close()
      }
      spark.table(tbl)
    }
}
