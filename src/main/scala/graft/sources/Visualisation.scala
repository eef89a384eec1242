package graft.sources

import graft.core.GraphState
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S13 — graph visualisation export (reference `Library.fs:7-32`:
  * Cytoscape HTML from node + edge lists). The engine side produces the
  * Cytoscape-shaped element rows as DataFrames — `{data: {id, label}}`
  * and `{data: {source, target, label}}` — for a filtered subgraph;
  * rendering to HTML is a driver-side template around the collected JSON.
  */
object Visualisation {

  /** JSON string literal with `<` escaped (script-element safe) — a
    * prettyName containing `</script>` must not terminate the inline
    * block the elements are embedded in.
    */
  private def q(s: String): String = {
    val sb = new StringBuilder("\"")
    Option(s).getOrElse("").foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '<' => sb.append("\\u003c")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  def nodeElements(g: GraphState, nodeTypes: Seq[String]): DataFrame =
    g.nodes.filter(col("nodeType").isin(nodeTypes: _*))
      .select(to_json(struct(
        struct(col("key").as("id"), col("prettyName").as("label"),
          col("nodeType").as("group")).as("data"))).as("element"))

  def edgeElements(g: GraphState, relTypes: Seq[String]): DataFrame =
    g.edges.filter(col("relType").isin(relTypes: _*))
      .select(to_json(struct(
        struct(col("src").as("source"), col("dst").as("target"),
          col("relType").as("label")).as("data"))).as("element"))

  /** Render a bounded subgraph to a self-contained Cytoscape HTML page.
    * `limit` guards against collecting an unbounded element set to the
    * driver — visualisation is inherently a small-subgraph operation.
    *
    * Edges are restricted to endpoints among the COLLECTED nodes
    * (cytoscape throws on edges referencing absent vertices — both
    * type-filtered-out and limit-truncated endpoints must drop), and
    * `<` is escaped in the embedded JSON so data-derived labels cannot
    * terminate the script element or inject markup.
    */
  def toHtml(g: GraphState, nodeTypes: Seq[String], relTypes: Seq[String],
             limit: Int = 2000): String = {
    val nodeRows = g.nodes.filter(col("nodeType").isin(nodeTypes: _*))
      .select("key", "prettyName", "nodeType").limit(limit).collect()
    val keys = nodeRows.map(_.getString(0)).toSet
    val nodeJson = nodeRows.map { r =>
      s"""{"data":{"id":${q(r.getString(0))},"label":${q(r.getString(1))},"group":${q(r.getString(2))}}}"""
    }
    val edgeJson = g.edges.filter(col("relType").isin(relTypes: _*))
      .filter(col("src").isInCollection(keys) && col("dst").isInCollection(keys))
      .select("src", "dst", "relType").limit(limit).collect()
      .map(r =>
        s"""{"data":{"source":${q(r.getString(0))},"target":${q(r.getString(1))},"label":${q(r.getString(2))}}}""")
    val elems = nodeJson ++ edgeJson
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"/>
       |<script src="https://unpkg.com/cytoscape/dist/cytoscape.min.js"></script>
       |</head><body><div id="cy" style="width:100%;height:100vh"></div>
       |<script>
       |cytoscape({ container: document.getElementById('cy'),
       |  elements: [${elems.mkString(",\n    ")}],
       |  layout: { name: 'cose' },
       |  style: [{ selector: 'node', style: { label: 'data(label)' } }]
       |});
       |</script></body></html>""".stripMargin
  }
}
