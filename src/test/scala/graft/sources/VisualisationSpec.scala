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
}
