package graft.sources

import graft.core.Ckpt._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory}
import graft.core.GraphState
import graft.model.{EdgeRow, Keys, NodeRow}
import org.apache.spark.sql.SparkSession

/** Compatibility layer for the reference's on-disk atom-file layout
  * (`Storage.fs:32-74,124-154`; shape catalogued in FIXTURES §1):
  *
  * ```
  * atom-<key>.json = [ [ keyJson, nodeJson ],
  *                     [ [srcKeyJson, dstKeyJson, weight, relJson], ... ] ]
  * keyJson         = {"FriendlyKey": ["<nodetype>", "<rest>"]}
  *                 | {"UUID": ["<nodetype>", "<guid>"]}
  * ```
  *
  * DU payloads use FSharpLu compact-union JSON: `{"CaseName": <fields>}`
  * or the bare string `"CaseName"` for field-less cases — we carry them
  * opaquely in the `payload`/`relPayload` columns.
  *
  * Parsing runs inside tasks (one shared thread-safe Jackson mapper) so a
  * directory of millions of atom files ingests in parallel; the
  * one-file-per-atom WRITE path exists only for round-trip compatibility
  * with the reference tooling — the scale path is [[graft.core.GraphIO]]
  * (partitioned parquet).
  */
object AtomFiles {

  // ObjectMapper is thread-safe for read/write after construction
  private val mapper = new ObjectMapper()

  private def parseKey(k: JsonNode): (String, String) = {
    val (tag, arr) =
      if (k.has("FriendlyKey")) ("FriendlyKey", k.get("FriendlyKey"))
      else if (k.has("UUID")) ("UUID", k.get("UUID"))
      else throw new IllegalArgumentException(
        s"atom key is neither FriendlyKey nor UUID: ${k.toString.take(80)}")
    val t = arr.get(0).asText()
    val rest = arr.get(1).asText()
    (s"${t}_$rest", tag)
  }

  /** Parse one atom-file JSON string → (node, out-edges). */
  def parseAtom(json: String): (NodeRow, Seq[EdgeRow]) = {
    val m = mapper
    val root = m.readTree(json)
    val nodePart = root.get(0)
    val (key, _) = parseKey(nodePart.get(0))
    val payload = nodePart.get(1)
    // payload is {"RoutingCase": {"ConcreteCase": {...}}} — node type comes
    // from the key prefix (lowercased type name, ref Graph.fs:20-23)
    val sep = key.indexOf('_')
    val nodeType = if (sep > 0) key.substring(0, sep) else key
    val pretty = "" // display names live in the index; recomputable via F5
    val node = NodeRow(key, nodeType, pretty, m.writeValueAsString(payload))
    val adj = root.get(1)
    val edges = (0 until adj.size()).map { i =>
      val e = adj.get(i)
      val (src, _) = parseKey(e.get(0))
      val (dst, _) = parseKey(e.get(1))
      EdgeRow(src, dst, e.get(2).asInt(), relCase(e.get(3)), m.writeValueAsString(e.get(3)))
    }
    (node, edges)
  }

  /** Relation case name from compact-union JSON: outer routing case →
    * inner case name (`{"Population": "IsA"}` → `IsA`;
    * `{"Exposure": {"TimeEstimate": {...}}}` → `TimeEstimate`).
    */
  def relCase(rel: JsonNode): String = {
    if (rel.isTextual) rel.asText()
    else if (!rel.fields().hasNext) "Unknown"
    else {
      val inner = rel.fields().next().getValue
      if (inner.isTextual) inner.asText()
      else if (inner.isObject && inner.fields().hasNext) inner.fields().next().getKey
      else rel.fields().next().getKey
    }
  }

  /** S1 — load a directory of `atom-*.json` files into a [[GraphState]].
    * `wholetext` keeps one file per row; parsing is distributed, and the
    * parsed dataset is materialized ONCE (localCheckpoint) so the node
    * and edge sides don't each re-read and re-parse the directory — the
    * eager in-memory load mirrors the reference's `loadOrInitGraph`
    * (`Storage.fs:195-220`), which also holds the whole graph in memory.
    */
  def load(spark: SparkSession, dir: String): GraphState = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "atom-*.json").text(dir).as[String]
    val parsed = raw.map(parseAtom _).lckpt()
    GraphState(parsed.map(_._1), parsed.flatMap(_._2))
  }

  /** Serialize one atom back to the reference JSON shape. The
    * FriendlyKey/UUID tag re-derives from the canonical UUID form
    * ([[Keys.parseKey]]) — matching how the reference's `stringToKey`
    * classifies (`Graph.fs:25-28`).
    */
  def renderAtom(node: NodeRow, edges: Seq[EdgeRow]): String = {
    val m = mapper
    val f = JsonNodeFactory.instance
    def keyJson(key: String): JsonNode = {
      val parsed = Keys.parseKey(key).getOrElse(
        throw new IllegalArgumentException(s"cannot render unparseable key '$key'"))
      f.objectNode().set[JsonNode](if (parsed.isUuid) "UUID" else "FriendlyKey",
        f.arrayNode().add(parsed.nodeType).add(parsed.id))
    }
    val root = f.arrayNode()
    root.add(f.arrayNode().add(keyJson(node.key)).add(m.readTree(node.payload)))
    val adj: ArrayNode = f.arrayNode()
    edges.foreach { e =>
      // natively-built edges carry an empty relPayload — render the
      // relation as the bare compact-union case string instead
      val relJson: JsonNode =
        if (e.relPayload == null || e.relPayload == "{}" || e.relPayload.isEmpty)
          f.textNode(e.relType)
        else m.readTree(e.relPayload)
      adj.add(f.arrayNode().add(keyJson(e.src)).add(keyJson(e.dst))
        .add(e.weight).add(relJson))
    }
    root.add(adj)
    m.writeValueAsString(root)
  }

  /** Filename-safe rendering of a key: path separators and traversal
    * sequences must not reach the filesystem (keys parsed from external
    * atom files are arbitrary text).
    */
  private def fileSafe(key: String): String =
    key.replaceAll("[/\\\\]", "_").replace("..", "_")

  /** S5 at scale — the same file-per-atom layout written from the
    * EXECUTORS: nodes cogroup with their out-edges on the key (one
    * co-partitioned shuffle), each partition renders and writes its own
    * atoms, and the driver never materializes the graph.
    *
    * Writes go through the Hadoop `FileSystem` resolved from the
    * directory URI, so the layout lands on whatever store the cluster
    * mounts — `file:` for the reference's posix directories, `hdfs:`,
    * or an `s3a:`-style object store — not just a shared local mount
    * (the earlier `java.nio` writer was single-node-only). Each atom is
    * written to a task-attempt-suffixed temp name and renamed into
    * place: concurrent speculative attempts never collide on the temp
    * (attempt id is unique), and the delete+rename publish is
    * idempotent because the bytes are deterministic (adjacency sorted)
    * — a retry republishes identical content. On object stores rename
    * degrades to copy+delete of ONE small atom, preserving the
    * one-PUT-per-atom cost shape. The driver's Hadoop configuration
    * ships to executors as its effective key/value map (credentials,
    * endpoints, and filesystem impls ride along). [[save]] keeps the
    * driver-side form for the reference's interactive-scale usage.
    */
  def saveDistributed(g: GraphState, dir: String): Unit = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    val spark = g.nodes.sparkSession
    import spark.implicits._
    // Configuration is not serializable; its effective entries are
    val confEntries: Array[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val confB = spark.sparkContext.broadcast(confEntries)
    val dirStr = dir
    locally {
      val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
      val p = new Path(dirStr)
      p.getFileSystem(conf).mkdirs(p)
    }
    g.nodes.groupByKey(_.key)
      .cogroup(g.edges.groupByKey(_.src)) { (_, ns, es) =>
        // deterministic adjacency order so the written bytes are stable
        // across runs and partitionings
        val adj = es.toSeq.sortBy(e => (e.dst, e.relType, e.weight))
        ns.map(n => (n.key, renderAtom(n, adj)))
      }
      .foreachPartition { (it: Iterator[(String, String)]) =>
        val conf = new Configuration(false)
        confB.value.foreach { case (k, v) => conf.set(k, v) }
        val dirPath = new Path(dirStr)
        val fs = dirPath.getFileSystem(conf)
        // one metadata-op-per-file matters at millions of atoms: local
        // .crc sidecar files would DOUBLE the create/rename count (the
        // atom bytes are deterministic and re-derivable — checksums buy
        // nothing here), and the publish rename is OPTIMISTIC — try it,
        // and only on refusal (HDFS-style no-overwrite rename onto a
        // prior attempt's file) delete and retry. Fresh writes — the
        // overwhelming case — pay exactly create + write + rename.
        fs.setWriteChecksum(false)
        fs.setVerifyChecksum(false)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        // local fast path: for the `file:` scheme the Hadoop stream
        // stack costs ~4× per tiny file (measured on the g49 roundtrip:
        // 1.3 s nio vs 5.2 s Hadoop LocalFileSystem at sf0.1); same
        // temp+rename publish semantics via java.nio with
        // REPLACE_EXISTING move. Every other scheme takes the generic
        // FileSystem path.
        val localRoot: Option[java.nio.file.Path] =
          if (fs.getScheme == "file")
            Some(java.nio.file.Paths.get(
              fs.makeQualified(dirPath).toUri.getPath))
          else None
        it.foreach { case (key, json) =>
          val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val dstName = s"atom-${fileSafe(key)}.json"
          val tmpName = s".$dstName.$attempt.tmp"
          localRoot match {
            case Some(root) =>
              val tmp = root.resolve(tmpName)
              java.nio.file.Files.write(tmp, bytes)
              java.nio.file.Files.move(tmp, root.resolve(dstName),
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            case None =>
              val dst = new Path(dirPath, dstName)
              val tmp = new Path(dirPath, tmpName)
              val out = fs.create(tmp, true)
              try out.write(bytes)
              finally out.close()
              if (!fs.rename(tmp, dst)) {
                fs.delete(dst, false)
                if (!fs.rename(tmp, dst))
                  throw new java.io.IOException(s"atom publish failed: $tmp -> $dst")
              }
          }
        }
      }
  }

  /** S5 — write one JSON file per atom (reference layout; local-fs test
    * path — NOT the scale path).
    */
  def save(g: GraphState, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val edgesBySrc = g.edges.collect().groupBy(_.src)
    g.nodes.collect().foreach { n =>
      val json = renderAtom(n, edgesBySrc.getOrElse(n.key, Array.empty).toSeq)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"atom-${fileSafe(n.key)}.json"), json)
    }
  }
}
