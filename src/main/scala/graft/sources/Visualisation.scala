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
    */
  def toHtml(g: GraphState, nodeTypes: Seq[String], relTypes: Seq[String],
             limit: Int = 2000): String = {
    val elems = (nodeElements(g, nodeTypes).limit(limit).collect() ++
      edgeElements(g, relTypes).limit(limit).collect()).map(_.getString(0))
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
