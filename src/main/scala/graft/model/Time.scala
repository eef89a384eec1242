package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar-year time index semantics (reference `Exposure.fs:59-70`,
  * `Scenarios.fs:12-40`, `Seed.fs:54-62`).
  *
  * The reference discretizes all temporal data onto an integer
  * calendar-year-before-present axis: one `CalYearNode` per year in
  * `[1950 - currentYear, 14000]` (14,073 nodes for 2022). Dates arrive in
  * four calendars (cal yr BP, uncal yr BP, AD, BC) and are normalized by
  * `holoceneCalYear`; anything older than the Holocene boundary (11,650 BP)
  * routes to a `pre-holocene` out-of-scope label instead of a year node.
  */
object Time {

  /** Reference seed bounds (`Seed.fs:56`): years −72..14000 cal yr BP. */
  val MinYearBP: Int = -72
  val MaxYearBP: Int = 14000

  /** Holocene boundary (reference `Seed.fs:96-98`): 11,650 cal yr BP. */
  val HoloceneBoundaryBP: Int = 11650

  /** Out-of-scope label node key — typed as
    * `QualitativeLabelOutOfScopeNode` like the reference
    * (`Scenarios.fs:40`, `Exposure.fs:77-80`), seeded by [[graft.core.Seed]].
    */
  val PreHoloceneKey: String =
    NodeTypes.QualitativeLabelOutOfScopeNode +
      "_pre_holocene_by_global_stratotype_section_and_point"

  /** F6 — `holoceneCalYear` (reference `Scenarios.fs:12-19`): normalize a
    * date in one of the four calendars to integer cal yr BP.
    *   AD y  → 1950 − y
    *   BC y  → 1950 + y
    *   BP / calYrBP → pass-through (rounded)
    */
  // HALF_UP (away from zero) to match Spark's round() in the Column form
  // exactly — scala math.round is floor(x+0.5), which differs at negative
  // half-integers (e.g. AD 1950.5 → −0.5: HALF_UP gives −1, floor gives 0)
  private def halfUp(d: Double): Int =
    BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt

  def holoceneCalYear(calendar: String, value: Double): Int = calendar match {
    case "AD" => halfUp(1950d - value)
    case "BC" => halfUp(1950d + value)
    case _    => halfUp(value) // "BP" | "calYrBP" | "uncalYrBP"
  }

  /** Column form of [[holoceneCalYear]] — a codegen-friendly `when` chain,
    * no UDF (stays inside whole-stage codegen).
    */
  def holoceneCalYearCol(calendar: Column, value: Column): Column =
    when(calendar === "AD", round(lit(1950d) - value))
      .when(calendar === "BC", round(lit(1950d) + value))
      .otherwise(round(value))
      .cast("int")

  /** F7 — year bounds check (reference `Exposure.fs:66-70`). */
  def inBounds(yearBP: Int): Boolean = yearBP >= MinYearBP && yearBP <= MaxYearBP

  /** J8/J9 — route a normalized year to its time-index node key, or to the
    * pre-Holocene out-of-scope label when older than the boundary
    * (reference `Scenarios.fs:24-40`, `Library.fs:929-942`).
    */
  def timeNodeKey(yearBP: Int): String =
    if (yearBP > HoloceneBoundaryBP) PreHoloceneKey else Keys.calYearKey(yearBP)

  /** Column form of [[timeNodeKey]]. */
  def timeNodeKeyCol(yearBP: Column): Column =
    when(yearBP > HoloceneBoundaryBP, lit(PreHoloceneKey))
      .otherwise(Keys.calYearKeyCol(yearBP))
}
