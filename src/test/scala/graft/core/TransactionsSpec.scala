package graft.core

import java.util.UUID
import graft.SparkSpec
import graft.model._

class TransactionsSpec extends SparkSpec {
  import spark.implicits._

  private val u1 = UUID.fromString("00000000-0000-0000-0000-000000000001")
  private val u2 = UUID.fromString("00000000-0000-0000-0000-000000000002")
  private val u3 = UUID.fromString("00000000-0000-0000-0000-000000000003")

  private def baseGraph: GraphState = {
    val seeded = Seed.seedGraph(spark)
    val extra = Seq(
      NodeRow("sourcenode_pub_smith_tet_1987", NodeTypes.SourceNode, "Smith 1987", "{}"),
      NodeRow(Keys.morphotypeKey("pollen", "Salix-type"), NodeTypes.BioticProxyNode, "Salix-type pollen", "{}"),
      NodeRow(Keys.key(NodeTypes.InferenceMethodNode, "implicit"), NodeTypes.InferenceMethodNode, "Implicit", "{}"),
      NodeRow(Keys.taxonKey("genus", "Salix"), NodeTypes.TaxonNode, "Salix", "{}")
    ).toDS()
    seeded.addNodesOrSkip(extra)
  }

  test("M9 hyperedge transaction rejects duplicate taxa (ref Storage.fs:425-427)") {
    val dup = Transactions.proxiedTaxon("tl", "proxy", "method",
      Seq("taxonnode_genus_salix", "taxonnode_genus_salix"), "outcome", u1)
    assert(dup.isLeft)
    assert(Transactions.proxiedTaxon("tl", "p", "m", Nil, "o", u1).isLeft)
  }

  test("M11 simpleSite wires extent, uncertainty, and location edges (ref Scenarios.fs:133-224)") {
    val batch = Transactions.simpleSite(
      "sourcenode_pub_smith_tet_1987", "Lake A", 68.2, 18.5, "LakeSediment",
      earliest = ("BP", 9000.0), latest = ("AD", 1950.0),
      earliestError = Some(100.0), timelineUuid = u1, contextUuid = u2).toOption.get
    assert(batch.nodes.map(_.nodeType).sorted ==
      Seq(NodeTypes.ContextNode, NodeTypes.IndividualTimelineNode))
    val rels = batch.edges.groupBy(_.relType).view.mapValues(_.map(_.dst).toSet).toMap
    assert(rels("ExtentEarliestSpecified") == Set("calyearnode_9000ybp"))
    assert(rels("ExtentLatestSpecified") == Set("calyearnode_0ybp"))
    // both uncertainty bounds under ExtentEarliestUncertainty (ref Scenarios.fs:169-177)
    assert(rels("ExtentEarliestUncertainty") == Set("calyearnode_9100ybp", "calyearnode_8900ybp"))
    assert(rels.contains("IsLocatedAt") && rels.contains("HasTemporalExtent"))

    // commits cleanly against a seeded graph (year nodes must exist)
    val g2 = Transactions.commit(baseGraph, batch)
    assert(g2.isRight)
    assert(g2.toOption.get.edges.count() == 2 + batch.edges.length)
  }

  test("M11 J9 routing: pre-Holocene earliest date becomes OutOfScope and COMMITS (label node seeded)") {
    val batch = Transactions.simpleSite(
      "sourcenode_pub_smith_tet_1987", "Old Site", 60, 20, "PeatCore",
      earliest = ("BP", 13000.0), latest = ("BP", 9000.0),
      earliestError = None, timelineUuid = u1, contextUuid = u2).toOption.get
    val e = batch.edges.find(_.relType == "ExtentEarliestOutOfScope").get
    assert(e.dst == Time.PreHoloceneKey)
    // end-to-end: the out-of-scope label exists in the seed, so the
    // routed edge passes FK validation
    val committed = Transactions.commit(baseGraph, batch)
    assert(committed.isRight, committed.left.toOption.mkString)
  }

  test("M11 validation: inverted extents, bad coordinates, and post-index dates rejected") {
    assert(Transactions.simpleSite("s", "X", 0, 0, "O",
      ("BP", 1000.0), ("BP", 2000.0), None, u1, u2).isLeft) // latest older than earliest
    assert(Transactions.simpleSite("s", "X", 91, 0, "O",
      ("BP", 2000.0), ("BP", 1000.0), None, u1, u2).isLeft)
    // newer than the index floor (−72 BP): no year node exists → validation Left
    assert(Transactions.simpleSite("s", "X", 0, 0, "O",
      ("BP", 2000.0), ("AD", 2100.0), None, u1, u2).isLeft)
  }

  test("site names with quotes/backslashes produce valid JSON payloads") {
    val batch = Transactions.simpleSite(
      "src", """Lake "Deep\End"""", 60, 20, "PeatCore",
      ("BP", 9000.0), ("BP", 1000.0), None, u1, u2).toOption.get
    val payload = batch.nodes.find(_.nodeType == NodeTypes.ContextNode).get.payload
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(payload)
    assert(parsed.get("Name").asText() == """Lake "Deep\End"""")
  }

  test("M12 treeRing builds timeline + implicit-inference hyperedge to presence (ref Scenarios.fs:226-311)") {
    val batch = Transactions.treeRing("sourcenode_pub_smith_tet_1987", "Forest B",
      65.0, 22.0, collectionYearAD = 2000,
      taxonKey = Keys.taxonKey("genus", "Salix"),
      proxyKey = Keys.morphotypeKey("pollen", "Salix-type"),
      timelineUuid = u1, contextUuid = u2, hyperUuid = u3).toOption.get
    val types = batch.edges.groupBy(_.relType).view.mapValues(_.size).toMap
    assert(types("InferredAs") == 1 && types("MeasuredBy") == 1 && types("HasProxyInfo") == 1)
    assert(batch.edges.find(_.relType == "MeasuredBy").get.dst == Keys.outcomeKey("presence"))
    assert(Transactions.commit(baseGraph, batch).isRight)
  }

  test("M13 screening state machine enforces legal transitions (ref Sources.fs:181-202)") {
    assert(Transactions.screen("Unscreened", "Included") == Right("Included"))
    assert(Transactions.screen("Included", "InProgress").isRight)
    assert(Transactions.screen("Stalled", "InProgress").isRight)
    assert(Transactions.screen("Excluded", "Included").isLeft)
    assert(Transactions.screen("Unscreened", "CompletedAll").isLeft)
  }

  test("A6 classifyTaxa partitions proposed names into linked/unlinked/error") {
    import org.apache.spark.sql.functions.col
    val g = baseGraph
    val proposed = Seq("Salix", "Nonexistus maximus", "", "LIFE").toDF("name")
    val out = Transactions.classifyTaxa(g, proposed)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("Salix") == "linked")      // matches prettyName "Salix"
    assert(out("LIFE") == "linked")       // case-insensitive latin match
    assert(out("Nonexistus maximus") == "unlinked")
    assert(out("") == "error")
    val key = Transactions.classifyTaxa(g, Seq("Salix").toDF("name"))
      .select(col("taxon_key")).head().getString(0)
    assert(key == Keys.taxonKey("genus", "Salix"))
  }

  test("commit is atomic-per-step: dangling edge endpoint aborts (M6 FK check)") {
    val bad = Transactions.TxBatch(
      Seq(NodeRow("contextnode_x", NodeTypes.ContextNode, "X", "{}")),
      Seq(EdgeRow("contextnode_x", "missing_node", 1, "IsLocatedAt", "{}")))
    assert(Transactions.commit(baseGraph, bad).isLeft)
  }
}
