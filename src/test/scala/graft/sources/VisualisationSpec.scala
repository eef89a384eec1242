package graft.sources

import graft.SparkSpec
import graft.core.GraphState
import graft.model.{EdgeRow, NodeRow}

class VisualisationSpec extends SparkSpec {
  import spark.implicits._

  test("S13 exports Cytoscape-shaped elements and bounded HTML (ref Library.fs:7-32)") {
    val g = GraphState(
      Seq(NodeRow("taxonnode_a", "taxonnode", "A", "{}"),
          NodeRow("taxonnode_b", "taxonnode", "B", "{}")).toDS(),
      Seq(EdgeRow("taxonnode_a", "taxonnode_b", 1, "IsA", "{}")).toDS())
    val html = Visualisation.toHtml(g, Seq("taxonnode"), Seq("IsA"))
    assert(html.contains(""""id":"taxonnode_a""""))
    assert(html.contains(""""source":"taxonnode_a","target":"taxonnode_b""""))
    assert(html.contains("cytoscape"))
    val limited = Visualisation.nodeElements(g, Seq("taxonnode")).limit(1).collect()
    assert(limited.length == 1)
  }

  test("edges to nodes outside the rendered set are dropped (cytoscape rejects dangling edges)") {
    val g = GraphState(
      Seq(NodeRow("taxonnode_a", "taxonnode", "A", "{}"),
          NodeRow("contextnode_x", "contextnode", "X", "{}")).toDS(),
      Seq(EdgeRow("taxonnode_a", "contextnode_x", 1, "IsLocatedAt", "{}")).toDS())
    // contextnode is filtered out → the edge must not appear
    val html = Visualisation.toHtml(g, Seq("taxonnode"), Seq("IsLocatedAt"))
    assert(html.contains(""""id":"taxonnode_a""""))
    assert(!html.contains(""""source""""))
  }

  test("data-derived labels cannot terminate the script element") {
    val g = GraphState(
      Seq(NodeRow("taxonnode_evil", "taxonnode", "</script><script>alert(1)</script>", "{}")).toDS(),
      spark.emptyDataset[EdgeRow])
    val html = Visualisation.toHtml(g, Seq("taxonnode"), Seq("IsA"))
    assert(!html.contains("</script><script>alert"))
    assert(html.contains("\\u003c/script>\\u003cscript>")) // '<' neutralized
  }
}
