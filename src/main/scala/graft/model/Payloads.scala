package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed codecs for the reference's DEEP payload sum types (SURVEY §7.4
  * hard-part 1): `IndividualDateNode` (`Types.fs:544-657`,
  * `Exposure.fs:14-34`), `DateCalibrationNode` (`Exposure.fs:87-105`) and
  * `DigitisedDatasetNode` (`Datasets.fs:139-166`), whose FSharpLu
  * compact-union JSON otherwise rides through the store as an opaque
  * string.
  *
  * One systematic tagged-struct convention, applied at every level:
  *
  *  1. RECORDS decode with `from_json` where every union-typed field is
  *     captured as a RAW-JSON string (`StringType` capture keeps the
  *     literal `{...}` text of an object and the bare text of a
  *     field-less case — Spark's JSON parser passes non-string tokens
  *     through verbatim when the target type is string).
  *  2. UNIONS decode from that raw string to a struct tagged with
  *     `case` — the compact-union case name via [[unionCase]] — plus one
  *     column per case field (multi-field cases are compact tuples,
  *     i.e. JSON arrays, read as `array<string>` and cast per slot).
  *  3. ENCODE is the exact inverse: a `when` chain over `case`
  *     reassembles the compact-union text (field-less → bare string,
  *     one field → `{"Case": v}`, tuples → `{"Case": [v1, v2]}`,
  *     `None` → field omitted), so `encode(decode(j))` equals the
  *     reference serializer's output as a JSON TREE (Jackson-tree
  *     equality): key order, separators, and string escapes match, but
  *     numeric literals keep Spark's double rendering ("50.0",
  *     "1.0E7"), which can differ from the spelling .NET chose — see
  *     [[num]].
  *
  * Everything is Column-level (codegen'd `from_json`/`get_json_object`/
  * string ops — no UDF, no driver parsing), so a 100 TB store can
  * project typed fields out of deep payloads in a single narrow stage.
  *
  * `DataTable` payloads (2-D float matrices, `Datasets.fs:23-31`) pass
  * through as raw JSON by design: tabular data routes to the S12/A5
  * ingest pivot, not the node codec.
  */
object Payloads {

  /** Active case of a compact-union JSON value: bare text for field-less
    * cases, the single key for `{"Case": ...}` objects.
    */
  def unionCase(raw: Column): Column =
    when(raw.isNull, lit(null).cast("string"))
      .when(raw.startsWith("{"), element_at(json_object_keys(raw), 1))
      .otherwise(raw)

  /** JSON text of a double column. Spark's double→string rendering
    * ("50.0", or "1.0E7" beyond 7 digits) is what the re-encode emits —
    * semantically identical JSON (the round-trip contract is
    * Jackson-tree equality), not necessarily the same numeric-literal
    * spelling .NET chose.
    */
  private def num(c: Column): Column = c.cast("double").cast("string")

  private def intNum(c: Column): Column = c.cast("int").cast("string")

  /** A compact JSON string literal: escape backslashes, quotes, the
    * short-form control characters (`\n`/`\r`/`\t` — RFC 8259 names
    * them, and the reference serializer emits the short forms), and
    * every OTHER control character U+0000–U+001F as `\u00XX` — a decoded
    * `\b` or U+0001 re-embedded raw would be invalid JSON and break the
    * codec's round-trip contract. The generic arm only fires on strings
    * that actually carry such a character (guarded by one `rlike`), so
    * the common path stays at the five cheap replaces.
    */
  private def jsonString(c: Column): Column = {
    val named = Seq("\\\\" -> "\\\\\\\\", "\"" -> "\\\\\"",
      "\n" -> "\\\\n", "\r" -> "\\\\r", "\t" -> "\\\\t")
      .foldLeft(c) { case (acc, (from, to)) => regexp_replace(acc, from, to) }
    // remaining control range: everything but \n \r \t (already short-form)
    val ctl = (0x00 to 0x1f).filterNot(Set(0x09, 0x0a, 0x0d))
    val esc = when(named.rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"),
      ctl.foldLeft(named) { (acc, cp) =>
        regexp_replace(acc, f"\\x$cp%02x", f"\\\\u$cp%04x")
      }).otherwise(named)
    concat(lit("\""), esc, lit("\""))
  }

  /** Loud-failure arm for every union `when` chain: an unrecognized (or
    * null) case must abort the job, not null-propagate through `concat`
    * and silently drop the whole re-encoded document.
    */
  private def unknownCase(what: String, c: Column): Column =
    raise_error(concat(lit(s"Payloads.$what: unencodable union case "), coalesce(c, lit("null"))))

  /** Fields-serialized .NET `Author` (`Types.fs:263`): shared by the
    * calibration-origin and digitised-dataset encoders. An empty
    * initials list renders `[]` (not `[""]`).
    */
  private def encodeAuthor(a: Column): Column = {
    val initials = coalesce(a.getField("item1"), array().cast("array<string>"))
    concat(
      lit("{\"item1\":"),
      when(size(initials) === 0, lit("[]"))
        .otherwise(concat(lit("[\""), array_join(initials, "\",\""), lit("\"]"))),
      lit(",\"item2\":"), jsonString(a.getField("item2")),
      lit(",\"item3\":"),
      when(a.getField("item3").isNotNull, jsonString(a.getField("item3"))).otherwise(lit("null")),
      lit("}"))
  }

  /** The compact tuple of a multi-field case as positional strings
    * (objects/arrays keep raw JSON text).
    */
  private def tuple(raw: Column, caseName: String): Column =
    from_json(get_json_object(raw, s"$$.$caseName"), ArrayType(StringType))

  // ------------------------------------------------- MeasurementError

  /** `OldDate.MeasurementError` (`Types.fs:544-553`) →
    * `{case, sigma, error, errorOlder, errorYounger}`. `Sigma` is
    * field-less (`OneSigma | TwoSigma | ThreeSigma`) so it rides as a
    * plain string.
    */
  def decodeMeasurementError(raw: Column): Column = {
    val c = unionCase(raw)
    val pm = tuple(raw, "DatingErrorPlusMinusSigma")
    val rg = tuple(raw, "DatingErrorRangeSigma")
    struct(
      c.as("case"),
      when(c === "DatingErrorPlusMinusSigma", element_at(pm, 1))
        .when(c === "DatingErrorRangeSigma", element_at(rg, 1)).as("sigma"),
      when(c === "DatingErrorPlusMinus",
        get_json_object(raw, "$.DatingErrorPlusMinus").cast("double"))
        .when(c === "DatingErrorPlusMinusSigma", element_at(pm, 2).cast("double")).as("error"),
      when(c === "DatingErrorRangeSigma", element_at(rg, 2).cast("double")).as("errorOlder"),
      when(c === "DatingErrorRangeSigma", element_at(rg, 3).cast("double")).as("errorYounger"))
  }

  def encodeMeasurementError(t: Column): Column = {
    val c = t.getField("case")
    when(c === "NoDatingErrorSpecified", lit("\"NoDatingErrorSpecified\""))
      .when(c === "DatingErrorPlusMinus",
        concat(lit("{\"DatingErrorPlusMinus\":"), num(t.getField("error")), lit("}")))
      .when(c === "DatingErrorPlusMinusSigma",
        concat(lit("{\"DatingErrorPlusMinusSigma\":[\""), t.getField("sigma"), lit("\","),
          num(t.getField("error")), lit("]}")))
      .when(c === "DatingErrorRangeSigma",
        concat(lit("{\"DatingErrorRangeSigma\":[\""), t.getField("sigma"), lit("\","),
          num(t.getField("errorOlder")), lit(","), num(t.getField("errorYounger")), lit("]}")))
      .otherwise(unknownCase("MeasurementError", c))
  }

  // -------------------------------------- CalibratedRadiocarbonDate(s)

  /** `CalibratedRadiocarbonDate` record (`Types.fs:573-593`) →
    * `{calibratedDate, calibrationCurve, uncalDate, uncalError}`.
    * The optional nested `UncalDate` record flattens into the last two
    * fields (absent → null).
    */
  def decodeCalibrated(raw: Column): Column =
    struct(
      get_json_object(raw, "$.CalibratedDate").cast("double").as("calibratedDate"),
      get_json_object(raw, "$.CalibrationCurve").as("calibrationCurve"),
      get_json_object(raw, "$.UncalibratedDate.Date").cast("double").as("uncalDate"),
      decodeMeasurementError(get_json_object(raw, "$.UncalibratedDate.UncalibratedDateError"))
        .as("uncalError"))

  def encodeCalibrated(t: Column): Column =
    concat(
      lit("{\"CalibratedDate\":"), num(t.getField("calibratedDate")),
      lit(",\"CalibrationCurve\":"), jsonString(t.getField("calibrationCurve")),
      when(t.getField("uncalDate").isNotNull,
        concat(lit(",\"UncalibratedDate\":{\"Date\":"), num(t.getField("uncalDate")),
          lit(",\"UncalibratedDateError\":"), encodeMeasurementError(t.getField("uncalError")),
          lit("}"))).otherwise(lit("")),
      lit("}"))

  private val dateRangeSchema = ArrayType(StructType(Seq(
    StructField("Sigma", StringType),
    StructField("EarlierBound", DoubleType),
    StructField("LaterBound", DoubleType))))

  /** `CalibratedRadiocarbonDateRanges` (`Types.fs:595-611`): like
    * [[decodeCalibrated]] but the date is a LIST of
    * `{Sigma, EarlierBound, LaterBound}` ranges.
    */
  def decodeCalibratedRanges(raw: Column): Column =
    struct(
      from_json(get_json_object(raw, "$.CalibratedDate"), dateRangeSchema).as("ranges"),
      get_json_object(raw, "$.CalibrationCurve").as("calibrationCurve"),
      get_json_object(raw, "$.UncalibratedDate.Date").cast("double").as("uncalDate"),
      decodeMeasurementError(get_json_object(raw, "$.UncalibratedDate.UncalibratedDateError"))
        .as("uncalError"))

  def encodeCalibratedRanges(t: Column): Column =
    concat(
      lit("{\"CalibratedDate\":["),
      array_join(transform(t.getField("ranges"), r =>
        concat(lit("{\"Sigma\":\""), r.getField("Sigma"),
          lit("\",\"EarlierBound\":"), num(r.getField("EarlierBound")),
          lit(",\"LaterBound\":"), num(r.getField("LaterBound")), lit("}"))), ","),
      lit("],\"CalibrationCurve\":"), jsonString(t.getField("calibrationCurve")),
      when(t.getField("uncalDate").isNotNull,
        concat(lit(",\"UncalibratedDate\":{\"Date\":"), num(t.getField("uncalDate")),
          lit(",\"UncalibratedDateError\":"), encodeMeasurementError(t.getField("uncalError")),
          lit("}"))).otherwise(lit("")),
      lit("}"))

  // ------------------------------------------------------- OldDate

  /** `OldDate.OldDate` (`Types.fs:567-571`) → `{case, bp, calibrated,
    * year}`.
    */
  def decodeOldDate(raw: Column): Column = {
    val c = unionCase(raw)
    struct(
      c.as("case"),
      when(c === "BP", get_json_object(raw, "$.BP").cast("double")).as("bp"),
      when(c === "CalYrBP", decodeCalibrated(get_json_object(raw, "$.CalYrBP"))).as("calibrated"),
      when(c === "HistoryYearAD", get_json_object(raw, "$.HistoryYearAD").cast("double"))
        .when(c === "HistoryYearBC", get_json_object(raw, "$.HistoryYearBC").cast("double"))
        .as("year"))
  }

  def encodeOldDate(t: Column): Column = {
    val c = t.getField("case")
    when(c === "BP", concat(lit("{\"BP\":"), num(t.getField("bp")), lit("}")))
      .when(c === "CalYrBP",
        concat(lit("{\"CalYrBP\":"), encodeCalibrated(t.getField("calibrated")), lit("}")))
      .when(c === "HistoryYearAD",
        concat(lit("{\"HistoryYearAD\":"), num(t.getField("year")), lit("}")))
      .when(c === "HistoryYearBC",
        concat(lit("{\"HistoryYearBC\":"), num(t.getField("year")), lit("}")))
      .otherwise(unknownCase("OldDate", c))
  }

  // ------------------------------------------------ OldDatingMethod

  /** `OldDate.OldDatingMethod` (`Types.fs:555-565`) → a tagged struct
    * with one slot per field kind: `{case, uncal, calibrated, ranges,
    * name, concentration, oldDate, year}`.
    */
  def decodeDatingMethod(raw: Column): Column = {
    val c = unionCase(raw)
    def tup(name: String) = tuple(raw, name)
    struct(
      c.as("case"),
      when(c === "RadiocarbonUncalibrated",
        get_json_object(raw, "$.RadiocarbonUncalibrated").cast("double"))
        .when(c === "RadiocarbonUncalibratedConventional",
          get_json_object(raw, "$.RadiocarbonUncalibratedConventional").cast("double"))
        .as("uncal"),
      when(c === "RadiocarbonCalibrated",
        decodeCalibrated(get_json_object(raw, "$.RadiocarbonCalibrated"))).as("calibrated"),
      when(c === "RadiocarbonCalibratedRanges",
        decodeCalibratedRanges(get_json_object(raw, "$.RadiocarbonCalibratedRanges"))).as("ranges"),
      when(c === "Tephra", element_at(tup("Tephra"), 1))
        .when(c === "HistoricEvent", element_at(tup("HistoricEvent"), 1))
        .when(c === "DepositionalZone", get_json_object(raw, "$.DepositionalZone"))
        .as("name"),
      when(c === "Lead210", element_at(tup("Lead210"), 1).cast("double"))
        .when(c === "Radiocaesium", element_at(tup("Radiocaesium"), 1).cast("double"))
        .as("concentration"),
      when(c === "Tephra", decodeOldDate(element_at(tup("Tephra"), 2)))
        .when(c === "HistoricEvent", decodeOldDate(element_at(tup("HistoricEvent"), 2)))
        .when(c === "Lead210", decodeOldDate(element_at(tup("Lead210"), 2)))
        .when(c === "Radiocaesium", decodeOldDate(element_at(tup("Radiocaesium"), 2)))
        .as("oldDate"),
      when(c === "CollectionDate", get_json_object(raw, "$.CollectionDate").cast("double"))
        .as("year"))
  }

  def encodeDatingMethod(t: Column): Column = {
    val c = t.getField("case")
    def nameAndDate(caseName: String) =
      concat(lit("{\"" + caseName + "\":["), jsonString(t.getField("name")), lit(","),
        encodeOldDate(t.getField("oldDate")), lit("]}"))
    def concAndDate(caseName: String) =
      concat(lit("{\"" + caseName + "\":["), num(t.getField("concentration")), lit(","),
        encodeOldDate(t.getField("oldDate")), lit("]}"))
    when(c === "RadiocarbonUncalibrated",
      concat(lit("{\"RadiocarbonUncalibrated\":"), num(t.getField("uncal")), lit("}")))
      .when(c === "RadiocarbonUncalibratedConventional",
        concat(lit("{\"RadiocarbonUncalibratedConventional\":"), num(t.getField("uncal")), lit("}")))
      .when(c === "RadiocarbonCalibrated",
        concat(lit("{\"RadiocarbonCalibrated\":"), encodeCalibrated(t.getField("calibrated")), lit("}")))
      .when(c === "RadiocarbonCalibratedRanges",
        concat(lit("{\"RadiocarbonCalibratedRanges\":"),
          encodeCalibratedRanges(t.getField("ranges")), lit("}")))
      .when(c === "Tephra", nameAndDate("Tephra"))
      .when(c === "HistoricEvent", nameAndDate("HistoricEvent"))
      .when(c === "Lead210", concAndDate("Lead210"))
      .when(c === "Radiocaesium", concAndDate("Radiocaesium"))
      .when(c === "CollectionDate",
        concat(lit("{\"CollectionDate\":"), num(t.getField("year")), lit("}")))
      .when(c === "DepositionalZone",
        concat(lit("{\"DepositionalZone\":"), jsonString(t.getField("name")), lit("}")))
      .otherwise(unknownCase("OldDatingMethod", c))
  }

  // ---------------------------------------------------- DepthInCore

  /** `StratigraphicSequence.DepthInCore` (`Types.fs:512-516`) →
    * `{case, depth, lower, upper, levelName}`. `Depth` is a single-case
    * union, which FSharpLu unwraps to the bare float.
    */
  def decodeDepth(raw: Column): Column = {
    val c = unionCase(raw)
    val band = tuple(raw, "DepthBand")
    struct(
      c.as("case"),
      when(c === "DepthPoint", get_json_object(raw, "$.DepthPoint").cast("double")).as("depth"),
      when(c === "DepthBand", element_at(band, 1).cast("double")).as("lower"),
      when(c === "DepthBand", element_at(band, 2).cast("double")).as("upper"),
      when(c === "DepthQualitativeLevel", get_json_object(raw, "$.DepthQualitativeLevel"))
        .as("levelName"))
  }

  def encodeDepth(t: Column): Column = {
    val c = t.getField("case")
    when(c === "DepthNotStated", lit("\"DepthNotStated\""))
      .when(c === "DepthPoint", concat(lit("{\"DepthPoint\":"), num(t.getField("depth")), lit("}")))
      .when(c === "DepthBand", concat(lit("{\"DepthBand\":["), num(t.getField("lower")),
        lit(","), num(t.getField("upper")), lit("]}")))
      .when(c === "DepthQualitativeLevel",
        concat(lit("{\"DepthQualitativeLevel\":"), jsonString(t.getField("levelName")), lit("}")))
      .otherwise(unknownCase("DepthInCore", c))
  }

  // ------------------------------------------- IndividualDateNode (F#)

  private val individualDateTop = StructType(Seq(
    StructField("Date", StringType),
    StructField("MeasurementError", StringType),
    StructField("MaterialDated", StringType),
    StructField("SampleDepth", StringType),
    StructField("LabNumber", StringType),
    StructField("Discarded", BooleanType)))

  /** `IndividualDateNode` (`Exposure.fs:14-34`): record over the three
    * unions above plus two optional scalars.
    */
  def decodeIndividualDate(payload: Column): Column = {
    val top = from_json(payload, individualDateTop)
    struct(
      decodeDatingMethod(top.getField("Date")).as("date"),
      decodeMeasurementError(top.getField("MeasurementError")).as("measurementError"),
      top.getField("MaterialDated").as("materialDated"),
      decodeDepth(top.getField("SampleDepth")).as("sampleDepth"),
      top.getField("LabNumber").as("labNumber"),
      top.getField("Discarded").as("discarded"))
  }

  def encodeIndividualDate(t: Column): Column =
    concat(
      lit("{\"Date\":"), encodeDatingMethod(t.getField("date")),
      lit(",\"MeasurementError\":"), encodeMeasurementError(t.getField("measurementError")),
      lit(",\"MaterialDated\":"), jsonString(t.getField("materialDated")),
      when(t.getField("sampleDepth").getField("case").isNotNull,
        concat(lit(",\"SampleDepth\":"), encodeDepth(t.getField("sampleDepth"))))
        .otherwise(lit("")),
      when(t.getField("labNumber").isNotNull,
        concat(lit(",\"LabNumber\":"), jsonString(t.getField("labNumber")))).otherwise(lit("")),
      lit(",\"Discarded\":"), t.getField("discarded").cast("string"),
      lit("}"))

  // ---------------------------------------- DateCalibrationNode (F#)

  /** .NET `Author` serializes by FIELDS (`Types.fs:263`):
    * `{item1: [chars], item2: lastName, item3: suffix|null}`.
    */
  private val authorSchema = StructType(Seq(
    StructField("item1", ArrayType(StringType)),
    StructField("item2", StringType),
    StructField("item3", StringType)))

  private val ageDepthSchema = ArrayType(StructType(Seq(
    StructField("Depth", DoubleType),
    StructField("Date", DoubleType),
    StructField("StandardDeviation", DoubleType))))

  private val dateCalibrationTop = StructType(Seq(
    StructField("CalibrationCurve", StringType),
    StructField("ModelApplied", StringType),
    StructField("SoftwareName", StringType),
    StructField("SoftwareVersion", StringType),
    StructField("Origin", StringType),
    StructField("AgeDepthModel", StringType)))

  /** `DateCalibrationNode` (`Exposure.fs:87-105`) → tagged structs for
    * the `CalibrationModel` and `DateCalibrationOrigin` unions plus a
    * typed age-depth list.
    */
  def decodeDateCalibration(payload: Column): Column = {
    val top = from_json(payload, dateCalibrationTop)
    val model = top.getField("ModelApplied")
    val mc = unionCase(model)
    val origin = top.getField("Origin")
    val oc = unionCase(origin)
    val reanalysis = tuple(origin, "PartOfReanalysis")
    struct(
      top.getField("CalibrationCurve").as("calibrationCurve"),
      struct(
        mc.as("case"),
        when(mc === "OxCalModel", get_json_object(model, "$.OxCalModel"))
          .when(mc === "OtherModel", get_json_object(model, "$.OtherModel")).as("text"))
        .as("model"),
      top.getField("SoftwareName").as("softwareName"),
      top.getField("SoftwareVersion").as("softwareVersion"),
      struct(
        oc.as("case"),
        when(oc === "PartOfReanalysis",
          from_json(element_at(reanalysis, 1), authorSchema)).as("conductedBy"),
        when(oc === "PartOfReanalysis", element_at(reanalysis, 2)).as("date"))
        .as("origin"),
      from_json(top.getField("AgeDepthModel"), ageDepthSchema).as("ageDepthModel"))
  }

  def encodeDateCalibration(t: Column): Column = {
    val m = t.getField("model")
    val mc = m.getField("case")
    val modelJson =
      when(mc === "Unmodelled", lit("\"Unmodelled\""))
        .when(mc === "OxCalModel",
          concat(lit("{\"OxCalModel\":"), jsonString(m.getField("text")), lit("}")))
        .when(mc === "OtherModel",
          concat(lit("{\"OtherModel\":"), jsonString(m.getField("text")), lit("}")))
        .otherwise(unknownCase("CalibrationModel", mc))
    val o = t.getField("origin")
    val oc = o.getField("case")
    val author = o.getField("conductedBy")
    val originJson =
      when(oc === "FromOriginalWork", lit("\"FromOriginalWork\""))
        .when(oc === "PartOfReanalysis",
          concat(lit("{\"PartOfReanalysis\":["), encodeAuthor(author),
            lit(","), jsonString(o.getField("date")), lit("]}")))
        .otherwise(unknownCase("DateCalibrationOrigin", oc))
    concat(
      lit("{\"CalibrationCurve\":"), jsonString(t.getField("calibrationCurve")),
      lit(",\"ModelApplied\":"), modelJson,
      lit(",\"SoftwareName\":"), jsonString(t.getField("softwareName")),
      lit(",\"SoftwareVersion\":"), jsonString(t.getField("softwareVersion")),
      lit(",\"Origin\":"), originJson,
      when(t.getField("ageDepthModel").isNotNull,
        concat(lit(",\"AgeDepthModel\":["),
          array_join(transform(t.getField("ageDepthModel"), r =>
            concat(lit("{\"Depth\":"), num(r.getField("Depth")),
              lit(",\"Date\":"), num(r.getField("Date")),
              when(r.getField("StandardDeviation").isNotNull,
                concat(lit(",\"StandardDeviation\":"), num(r.getField("StandardDeviation"))))
                .otherwise(lit("")),
              lit("}"))), ","),
          lit("]"))).otherwise(lit("")),
      lit("}"))
  }

  // ---------------------------------------- DigitisedDatasetNode (F#)

  private val digitisedTop = StructType(Seq(
    StructField("WhatWasDigitised", StringType),
    StructField("SoftwareUsed", StringType),
    StructField("Metric", StringType),
    StructField("Units", StringType),
    StructField("DigitisedBy", StringType),
    StructField("DigitisedOn", StringType),
    StructField("DataTable", StringType),
    StructField("Dimensions", StringType)))

  /** `DigitisedDataset` (`Datasets.fs:139-166`): four small unions, an
    * author, a date, and the raw data tables (passed through — see the
    * object doc).
    */
  def decodeDigitisedDataset(payload: Column): Column = {
    val top = from_json(payload, digitisedTop)
    val loc = top.getField("WhatWasDigitised")
    val lc = unionCase(loc)
    val sw = top.getField("SoftwareUsed")
    val sc = unionCase(sw)
    val metric = top.getField("Metric")
    val mc = unionCase(metric)
    val units = top.getField("Units")
    val uc = unionCase(units)
    struct(
      struct(
        lc.as("case"),
        when(lc === "FromFigure", get_json_object(loc, "$.FromFigure").cast("int"))
          .when(lc === "FromTable", get_json_object(loc, "$.FromTable").cast("int")).as("number"),
        when(lc === "FromSupplementaryFigure", get_json_object(loc, "$.FromSupplementaryFigure"))
          .when(lc === "FromSupplementaryTable", get_json_object(loc, "$.FromSupplementaryTable"))
          .as("label"))
        .as("location"),
      struct(
        sc.as("case"),
        when(sc === "OtherSoftware", get_json_object(sw, "$.OtherSoftware")).as("name"))
        .as("software"),
      struct(
        mc.as("case"),
        when(mc === "OtherMetric", get_json_object(metric, "$.OtherMetric")).as("text"))
        .as("metric"),
      struct(
        uc.as("case"),
        when(uc === "CountPerCmCubed", get_json_object(units, "$.CountPerCmCubed").cast("int"))
          .as("cm3"),
        when(uc === "OtherUnit", get_json_object(units, "$.OtherUnit")).as("text"))
        .as("units"),
      from_json(top.getField("DigitisedBy"), authorSchema).as("digitisedBy"),
      top.getField("DigitisedOn").as("digitisedOn"),
      top.getField("DataTable").as("dataTable"),
      top.getField("Dimensions").as("dimensions"))
  }

  def encodeDigitisedDataset(t: Column): Column = {
    val l = t.getField("location"); val lc = l.getField("case")
    val locJson =
      when(lc === "FromFigure",
        concat(lit("{\"FromFigure\":"), intNum(l.getField("number")), lit("}")))
        .when(lc === "FromTable",
          concat(lit("{\"FromTable\":"), intNum(l.getField("number")), lit("}")))
        .when(lc === "FromSupplementaryFigure",
          concat(lit("{\"FromSupplementaryFigure\":"), jsonString(l.getField("label")), lit("}")))
        .when(lc === "FromSupplementaryTable",
          concat(lit("{\"FromSupplementaryTable\":"), jsonString(l.getField("label")), lit("}")))
        .otherwise(unknownCase("SourceDataLocation", lc))
    val s = t.getField("software"); val sc = s.getField("case")
    val swJson =
      when(sc === "PlotDigitizer", lit("\"PlotDigitizer\""))
        .when(sc === "OtherSoftware",
          concat(lit("{\"OtherSoftware\":"), jsonString(s.getField("name")), lit("}")))
        .otherwise(unknownCase("SoftwareUsed", sc))
    val m = t.getField("metric"); val mc = m.getField("case")
    val metricJson =
      when(mc === "OtherMetric",
        concat(lit("{\"OtherMetric\":"), jsonString(m.getField("text")), lit("}")))
        .when(mc.isNotNull, concat(lit("\""), mc, lit("\"")))
        .otherwise(unknownCase("Metric", mc))
    val u = t.getField("units"); val uc = u.getField("case")
    val unitsJson =
      when(uc === "CountPerCmCubed",
        concat(lit("{\"CountPerCmCubed\":"), intNum(u.getField("cm3")), lit("}")))
        .when(uc === "OtherUnit",
          concat(lit("{\"OtherUnit\":"), jsonString(u.getField("text")), lit("}")))
        .when(uc.isNotNull, concat(lit("\""), uc, lit("\"")))
        .otherwise(unknownCase("MetricUnit", uc))
    val authorJson = encodeAuthor(t.getField("digitisedBy"))
    concat(
      lit("{\"WhatWasDigitised\":"), locJson,
      lit(",\"SoftwareUsed\":"), swJson,
      lit(",\"Metric\":"), metricJson,
      lit(",\"Units\":"), unitsJson,
      lit(",\"DigitisedBy\":"), authorJson,
      lit(",\"DigitisedOn\":"), jsonString(t.getField("digitisedOn")),
      lit(",\"DataTable\":"), t.getField("dataTable"),
      when(t.getField("dimensions").isNotNull,
        concat(lit(",\"Dimensions\":"), t.getField("dimensions"))).otherwise(lit("")),
      lit("}"))
  }
}
