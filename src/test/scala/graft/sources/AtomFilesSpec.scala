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

  test("saveDistributed writes byte-identical files to the driver-side save") {
    val g = GraphState(
      Seq(
        NodeRow("taxonnode_genus_salix", "taxonnode", "", """{"PopulationNode":{"TaxonomyNode":{"Genus":"Salix"}}}"""),
        NodeRow("taxonnode_family_salicaceae", "taxonnode", "", """{"PopulationNode":{"TaxonomyNode":{"Family":"Salicaceae"}}}""")
      ).toDS(),
      Seq(
        EdgeRow("taxonnode_genus_salix", "taxonnode_family_salicaceae", 1, "IsA", "{}"),
        EdgeRow("taxonnode_genus_salix", "taxonnode_genus_salix", 1, "IsSynonymOf", "{}")
      ).toDS())
    val d1 = java.nio.file.Files.createTempDirectory("graft-atoms-drv").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-atoms-dist").toString
    AtomFiles.save(g, d1)
    AtomFiles.saveDistributed(g, d2)
    val f1 = new java.io.File(d1).listFiles().filter(_.getName.startsWith("atom-"))
      .map(f => f.getName -> java.nio.file.Files.readString(f.toPath)).toMap
    val f2 = new java.io.File(d2).listFiles().filter(_.getName.startsWith("atom-"))
      .map(f => f.getName -> java.nio.file.Files.readString(f.toPath)).toMap
    assert(f1.keySet == f2.keySet)
    // save() groups adjacency in collect order; with the deterministic
    // two-edge atom sorted identically the bytes must match exactly
    f1.foreach { case (name, body) => assert(f2(name) == body, s"file $name differs") }

    // and the writer resolves an explicit Hadoop filesystem URI (the
    // object-store path: scheme routing, create-temp-rename publish) —
    // `file:` is the scheme-qualified Hadoop FS the test rig has
    val d3 = java.nio.file.Files.createTempDirectory("graft-atoms-uri").toString
    AtomFiles.saveDistributed(g, s"file:$d3")
    val f3 = new java.io.File(d3).listFiles().filter(_.getName.startsWith("atom-"))
      .map(f => f.getName -> java.nio.file.Files.readString(f.toPath)).toMap
    assert(f3 == f1)
    // re-publish over existing files must be idempotent (retry semantics)
    AtomFiles.saveDistributed(g, s"file:$d3")
    val f3b = new java.io.File(d3).listFiles().filter(_.getName.startsWith("atom-"))
      .map(f => f.getName -> java.nio.file.Files.readString(f.toPath)).toMap
    assert(f3b == f1)
    // no temp droppings left behind
    assert(!new java.io.File(d3).listFiles().exists(_.getName.endsWith(".tmp")))
  }

  test("saveDistributed PURE-Hadoop branch (non-file scheme) publishes byte-identical atoms") {
    // `file:` URIs take the java.nio fast path; a re-badged RawLocalFileSystem
    // under the `graftfs` scheme forces the generic FileSystem branch —
    // create(temp) + write + optimistic rename, the object-store code path —
    // while the bytes still land on local disk for inspection
    val g = GraphState(
      Seq(
        NodeRow("taxonnode_genus_salix", "taxonnode", "", """{"PopulationNode":{"TaxonomyNode":{"Genus":"Salix"}}}"""),
        NodeRow("taxonnode_family_salicaceae", "taxonnode", "", """{"PopulationNode":{"TaxonomyNode":{"Family":"Salicaceae"}}}""")
      ).toDS(),
      Seq(
        EdgeRow("taxonnode_genus_salix", "taxonnode_family_salicaceae", 1, "IsA", "{}"),
        EdgeRow("taxonnode_genus_salix", "taxonnode_genus_salix", 1, "IsSynonymOf", "{}")
      ).toDS())
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val dRef = java.nio.file.Files.createTempDirectory("graft-atoms-ref").toString
    val dHdp = java.nio.file.Files.createTempDirectory("graft-atoms-hdp").toString
    AtomFiles.save(g, dRef)
    AtomFiles.saveDistributed(g, s"graftfs://$dHdp")
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("atom-"))
      .map(f => f.getName -> java.nio.file.Files.readString(f.toPath)).toMap
    val ref = files(dRef)
    assert(files(dHdp) == ref)
    // retry over existing files must be idempotent through the Hadoop
    // rename path too (the refusal-then-delete-and-retry publish)
    AtomFiles.saveDistributed(g, s"graftfs://$dHdp")
    assert(files(dHdp) == ref)
    assert(!new java.io.File(dHdp).listFiles().exists(_.getName.endsWith(".tmp")))
    // and no checksum sidecars — the writer disables them explicitly
    assert(!new java.io.File(dHdp).listFiles().exists(_.getName.endsWith(".crc")))
  }
}

/** [[org.apache.hadoop.fs.RawLocalFileSystem]] re-badged under a
  * non-`file` scheme: instantiated by Hadoop reflection via
  * `fs.graftfs.impl`, it makes `saveDistributed` take the generic
  * object-store branch while writing to the local disk the spec reads.
  */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
