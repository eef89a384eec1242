package graft.core

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S14 — seed graph (reference `Seed.fs:48-99`): the calendar-year time
  * index (−72..14000 cal yr BP, 14,073 nodes), the Holocene label, the six
  * biodiversity-outcome dimension nodes, the `Life` taxon root, and the
  * Holocene extent edges (`EarliestTime`→11650ybp, `LatestTime`→0ybp).
  *
  * The year dimension is generated with `spark.range` (no driver-side loop;
  * the reference's list-append seed is O(n²), `Graph.fs:69`) and is small
  * enough to broadcast in every join against it — the Spark analogue of the
  * reference's consolidated single-file store for `CalYearNode`
  * (`Storage.fs:94-105`).
  */
object Seed {

  val HoloceneAuthority = "Global Stratotype Section and Point"

  /** The six outcome measures seeded by the reference (`Seed.fs:75-84`). */
  val outcomes: Seq[String] =
    Seq("abundance", "beta_diversity", "evenness", "presence", "presence_absence", "richness")

  /** The 14,073-row year dimension as a nodes Dataset. */
  def yearDimension(spark: SparkSession): Dataset[NodeRow] = {
    import spark.implicits._
    spark
      .range(Time.MinYearBP.toLong, Time.MaxYearBP.toLong + 1)
      .select(
        Keys.calYearKeyCol(col("id")).as("key"),
        lit(NodeTypes.CalYearNode).as("nodeType"),
        concat(col("id").cast("string"), lit(" cal yr BP")).as("prettyName"),
        to_json(struct(col("id").cast("int").as("year"))).as("payload")
      )
      .as[NodeRow]
  }

  /** `Next` sequence edges over the time index: `y ybp → (y−1) ybp`,
    * i.e. pointing forward in time toward the present (reference models
    * the relation as `Next of CalYearNode * CalYearNode`,
    * `Exposure.fs:123`, but its seed never emits the edges,
    * `Seed.fs:48-99`). A dense integer index needs no `lead` window —
    * the successor is computable, so this is a map-side `spark.range`
    * projection (the window-derived form for non-dense sequences is
    * exercised by query g15).
    */
  def nextEdges(spark: SparkSession): Dataset[EdgeRow] = {
    import spark.implicits._
    spark.range(Time.MinYearBP.toLong + 1, Time.MaxYearBP.toLong + 1)
      .select(
        Keys.calYearKeyCol(col("id")).as("src"),
        Keys.calYearKeyCol(col("id") - 1).as("dst"),
        lit(1).as("weight"), lit("Next").as("relType"), lit("{}").as("relPayload"))
      .as[EdgeRow]
  }

  /** Materialized `Contains` edges (reference `Exposure.fs:125`): one
    * edge per calendar year inside a label's temporal extent — the
    * edge-parity twin of the BETWEEN range join (query g22). Input rows
    * are `(labelKey, earliestBP, latestBP)` with earliest ≥ latest on the
    * BP axis; extents are clipped to the seeded year bounds so no edge
    * ever dangles. Derivation is a map-side `sequence`+`explode` (one
    * output row per contained year — linear work, no shuffle, no driver
    * loop), so materializing membership for a 10k-label timeline set is
    * a single narrow stage at any scale.
    */
  def containsEdges(extents: org.apache.spark.sql.DataFrame): Dataset[EdgeRow] = {
    import extents.sparkSession.implicits._
    extents
      // an extent entirely outside the seeded year window clips to an
      // EMPTY range, not a descending one: sequence(start, stop) with
      // start > stop silently steps -1 and would emit edges to year
      // nodes that don't exist
      .filter(greatest(col("latestBP"), lit(Time.MinYearBP)) <=
              least(col("earliestBP"), lit(Time.MaxYearBP)))
      .select(col("labelKey"),
        explode(sequence(
          greatest(col("latestBP"), lit(Time.MinYearBP)),
          least(col("earliestBP"), lit(Time.MaxYearBP)))).as("y"))
      .select(
        col("labelKey").as("src"),
        Keys.calYearKeyCol(col("y")).as("dst"),
        lit(1).as("weight"), lit("Contains").as("relType"), lit("{}").as("relPayload"))
      .as[EdgeRow]
  }

  /** Full seed: year dim + Holocene label + outcomes + Life root + extent
    * edges (reference `Seed.fs:64-98`). `withNextEdges` additionally
    * materializes the year-sequence `Next` edges ([[nextEdges]]).
    */
  def seedGraph(spark: SparkSession, withNextEdges: Boolean): GraphState = {
    val g = seedGraph(spark)
    if (withNextEdges) GraphState(g.nodes, g.edges.unionByName(nextEdges(spark)))
    else g
  }

  def seedGraph(spark: SparkSession): GraphState = {
    import spark.implicits._
    val holoceneKey = Keys.qualitativeLabelKey("holocene", HoloceneAuthority)
    val dims = (
      Seq(
        NodeRow(holoceneKey, NodeTypes.QualitativeLabelNode, "Holocene",
          s"""{"Name":"Holocene","DesignatingAuthority":"$HoloceneAuthority"}"""),
        // out-of-scope routing target (J9) — must exist or every
        // pre-Holocene extent edge dangles at commit time
        NodeRow(Time.PreHoloceneKey, NodeTypes.QualitativeLabelOutOfScopeNode, "Pre-Holocene",
          s"""{"Name":"Pre-Holocene","DesignatingAuthority":"$HoloceneAuthority"}"""),
        NodeRow(Keys.taxonKey("life"), NodeTypes.TaxonNode, "Life", """{"Life":{}}""")
      ) ++ outcomes.map(o =>
        NodeRow(Keys.outcomeKey(o), NodeTypes.BiodiversityDimensionNode, o, s"""{"$o":{}}"""))
    ).toDS()
    val extentEdges = Seq(
      EdgeRow(holoceneKey, Keys.calYearKey(Time.HoloceneBoundaryBP), 1, "EarliestTime", "{}"),
      EdgeRow(holoceneKey, Keys.calYearKey(0), 1, "LatestTime", "{}")
    ).toDS()
    GraphState(yearDimension(spark).unionByName(dims), extentEdges)
  }
}
