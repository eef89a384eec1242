package graft.model

/** Core physical schema of the graph engine.
  *
  * The reference (`AndrewIOM/biodiversity-graph-db`) models the graph as an
  * in-memory adjacency list: `Graph = Atom list`, `Atom = Node * Adjacency`
  * (reference `Graph.fs:43-47`). We re-express the same information as two
  * distributed, columnar tables — a nodes table and an edges table — which is
  * the idiomatic Spark layout: scans prune on `nodeType` (the reference
  * groups by node type everywhere, `Storage.fs:188-193`), traversals become
  * hash joins, and mutations become Dataset transformations.
  *
  * Payloads in the reference are deeply nested F# sum types serialized as
  * compact-union JSON (`Storage.fs:14`, `{"CaseName": {...}}`). We keep the
  * payload as that same JSON string at the storage boundary (round-trippable
  * with the reference's files) and project typed columns out of it with
  * `from_json` where a query needs structure.
  */
final case class NodeRow(
    key: String,        // "{nodetype}_{id}", reference `Graph.fs:9-28`
    nodeType: String,   // 22-value routing tag, reference `Graph.fs:215-247`
    prettyName: String, // `Node.DisplayName()`, reference `Graph.fs:251-365`
    payload: String     // compact-union JSON payload
)

/** One directed, weighted, typed edge (reference `Graph.fs:32-36`:
  * source key, sink key, integer weight — always 1 in practice — and a
  * typed relation payload).
  */
final case class EdgeRow(
    src: String,
    dst: String,
    weight: Int,
    relType: String,    // 40-case relation vocabulary (see [[RelationTypes]])
    relPayload: String  // JSON payload for property-carrying relations
)

/** Index row mirroring the reference's `NodeIndexItem {NodeId; NodeTypeName;
  * PrettyName}` (`Storage.fs:76-80`).
  */
final case class NodeIndexItem(key: String, nodeType: String, prettyName: String)

/** The 22 concrete node types of the reference schema (`Graph.fs:215-247`). */
object NodeTypes {
  val SourceNode = "sourcenode"
  val TaxonNode = "taxonnode"
  val TaxonomicNamesIndexNode = "taxonomicnamesindexnode"
  val VernacularTaxonLabelNode = "vernaculartaxonlabelnode"
  val BioticProxyNode = "bioticproxynode"
  val BioticProxyCategoryNode = "bioticproxycategorynode"
  val InferenceMethodNode = "inferencemethodnode"
  val ProxiedTaxonNode = "proxiedtaxonnode"
  val ContextNode = "contextnode"
  val CalYearNode = "calyearnode"
  val QualitativeLabelNode = "qualitativelabelnode"
  val QualitativeLabelOutOfScopeNode = "qualitativelabeloutofscopenode"
  val IndividualTimelineNode = "individualtimelinenode"
  val IndividualDateNode = "individualdatenode"
  val DateCalibrationInstanceNode = "datecalibrationinstancenode"
  val BiodiversityDimensionNode = "biodiversitydimensionnode"
  val DigitisedDatasetNode = "digitiseddatasetnode"

  val all: Seq[String] = Seq(
    SourceNode, TaxonNode, TaxonomicNamesIndexNode, VernacularTaxonLabelNode,
    BioticProxyNode, BioticProxyCategoryNode, InferenceMethodNode,
    ProxiedTaxonNode, ContextNode, CalYearNode, QualitativeLabelNode,
    QualitativeLabelOutOfScopeNode, IndividualTimelineNode, IndividualDateNode,
    DateCalibrationInstanceNode, BiodiversityDimensionNode, DigitisedDatasetNode
  )
}

/** The 40-case relation vocabulary (reference `Exposure.fs:159-186`,
  * `Population.fs:187-195`, `Sources.fs:210-220`, `Datasets.fs:171-172`).
  */
object RelationTypes {
  // ExposureRelation (26)
  val exposure: Seq[String] = Seq(
    "Next", "Contains", "EarliestTime", "LatestTime", "TimeEstimate",
    "OccursWithin", "OccursOutOfScope", "UsedInCalibration", "Calibrated",
    "UncertaintyOldest", "UncertaintyYoungest", "ExtentEarliest",
    "ExtentEarliestSpecified", "ExtentEarliestUncertainty",
    "ExtentEarliestOutOfScope", "ExtentLatestSpecified", "ExtentLatest",
    "ExtentLatestUncertainty", "IntersectsTime", "ConstructedWithDate",
    "HasProxyInfo", "HasProxyCategory", "HasOrphanProxy", "IsLocatedAt",
    "HasRawData", "ExtentEarliestHarmonised", "ExtentLatestHarmonised"
  )
  // PopulationRelation (8)
  val population: Seq[String] = Seq(
    "IsA", "IsSynonymOf", "HasIdentifier", "HasLabel",
    "InferredFrom", "InferredUsing", "InferredAs", "MeasuredBy"
  )
  // SourceRelation (5)
  val source: Seq[String] = Seq(
    "HasTemporalExtent", "UsesPrimarySource", "UsedDatabase", "HasDataset",
    "IsChapterIn"
  )
  // DatasetRelation (1)
  val dataset: Seq[String] = Seq("IsProxyGroup")

  val all: Seq[String] = exposure ++ population ++ source ++ dataset
}
