package graft.sources

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
    val parsed = raw.map(parseAtom _).localCheckpoint()
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
    * atoms, and the driver never materializes the graph. Tasks write
    * disjoint key-named files, so a retry overwrites only its own
    * output (idempotent on a posix dir; on an object store the same
    * layout maps to one PUT per atom). [[save]] keeps the driver-side
    * form for the reference's interactive-scale usage.
    */
  def saveDistributed(g: GraphState, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val spark = g.nodes.sparkSession
    import spark.implicits._
    g.nodes.groupByKey(_.key)
      .cogroup(g.edges.groupByKey(_.src)) { (_, ns, es) =>
        // deterministic adjacency order so the written bytes are stable
        // across runs and partitionings
        val adj = es.toSeq.sortBy(e => (e.dst, e.relType, e.weight))
        ns.map(n => (n.key, renderAtom(n, adj)))
      }
      .foreachPartition { (it: Iterator[(String, String)]) =>
        it.foreach { case (key, json) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"atom-${fileSafe(key)}.json"), json)
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
