package graft.sources

import graft.SparkSpec
import graft.core.GraphState
import graft.model.{EdgeRow, NodeRow}

class AtomFilesSpec extends SparkSpec {
  import spark.implicits._

  val salixAtom: String =
    """[
      |  [ {"FriendlyKey": ["taxonnode", "genus_salix"]},
      |    {"PopulationNode": {"TaxonomyNode": {"Genus": "Salix"}}} ],
      |  [
      |    [ {"FriendlyKey": ["taxonnode", "genus_salix"]},
      |      {"FriendlyKey": ["taxonnode", "family_salicaceae"]},
      |      1,
      |      {"Population": "IsA"} ]
      |  ]
      |]""".stripMargin

  test("parseAtom reads the reference atom-file shape (FIXTURES §1)") {
    val (node, edges) = AtomFiles.parseAtom(salixAtom)
    assert(node.key == "taxonnode_genus_salix")
    assert(node.nodeType == "taxonnode")
    assert(node.payload.contains("\"Genus\":\"Salix\""))
    assert(edges.length == 1)
    val e = edges.head
    assert(e.src == "taxonnode_genus_salix")
    assert(e.dst == "taxonnode_family_salicaceae")
    assert(e.weight == 1 && e.relType == "IsA")
  }

  test("relCase handles bare, routed, and property-carrying relation JSON") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(AtomFiles.relCase(m.readTree("\"IsA\"")) == "IsA")
    assert(AtomFiles.relCase(m.readTree("""{"Population": "IsA"}""")) == "IsA")
    assert(AtomFiles.relCase(m.readTree(
      """{"Exposure": {"TimeEstimate": {"calYearBP": 9000}}}""")) == "TimeEstimate")
  }

  test("directory load + save round-trips through the reference layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-atoms").toString
    val g = GraphState(
      Seq(
        NodeRow("taxonnode_genus_salix", "taxonnode", "", """{"PopulationNode":{"TaxonomyNode":{"Genus":"Salix"}}}"""),
        NodeRow("taxonnode_family_salicaceae", "taxonnode", "", """{"PopulationNode":{"TaxonomyNode":{"Family":"Salicaceae"}}}""")
      ).toDS(),
      Seq(EdgeRow("taxonnode_genus_salix", "taxonnode_family_salicaceae", 1, "IsA", "{}")).toDS())
    AtomFiles.save(g, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("atom-")) == 2)
    val g2 = AtomFiles.load(spark, dir)
    assert(g2.nodes.count() == 2)
    val e = g2.edges.head()
    assert(e.src == "taxonnode_genus_salix" && e.dst == "taxonnode_family_salicaceae")
    assert(e.relType == "IsA")
  }
}
