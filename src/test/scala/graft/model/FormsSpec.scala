package graft.model

import graft.SparkSpec
import graft.model.Forms._
import graft.model.Forms.SimpleValue._
import org.apache.spark.sql.functions._

/** The reference's form-construction tests (`tests/.../Forms.fs:24-158`)
  * replayed against the schema-driven constructor, asserting on the
  * compact-union payload JSON (the engine's persisted form) instead of
  * .NET object equality, plus the reference's error strings and a
  * decoder round-trip through [[Payloads]].
  */
class FormsSpec extends SparkSpec {

  private def ok(r: Either[String, Json]): String =
    r.fold(e => fail(s"expected Ok, got Error: $e"), _.render)

  private def err(r: Either[String, Json]): String =
    r.fold(identity, j => fail(s"expected Error, got Ok: ${j.render}"))

  // ``works with a DU with no fields``
  test("DU with no fields") {
    assert(ok(createFromViewModel(taxonNode, Du("Life", NotEnteredYet))) === "\"Life\"")
  }

  // ``works with a DU with single field``
  test("DU with single field") {
    val vm = Du("Family", FieldMap(Map("name" -> Value(Txt("Betula")))))
    assert(ok(createFromViewModel(taxonNode, vm)) === """{"Family":"Betula"}""")
  }

  // ``works with a DU with multiple fields``
  test("DU with multiple fields") {
    val vm = Du("Subspecies", FieldMap(Map(
      "generic" -> Value(Txt("Betula")),
      "specific" -> Value(Txt("pendula")),
      "subspecific" -> Value(Txt("mandshurica")),
      "authorship" -> Value(Txt("L.")))))
    assert(ok(createFromViewModel(taxonNode, vm)) ===
      """{"Subspecies":["Betula","pendula","mandshurica","L."]}""")
  }

  // ``works with nested DU type``
  test("nested DU type") {
    val vm = Du("Morphotype", Du("Microfossil", FieldMap(Map(
      "proxyGroup" -> Du("Pollen", NotEnteredYet),
      "morphotypeName" -> Value(Txt("Salix-type"))))))
    assert(ok(createFromViewModel(bioticProxyNode, vm)) ===
      """{"Morphotype":{"Microfossil":["Pollen","Salix-type"]}}""")
  }

  // ``works with list fields``
  test("list fields") {
    val vm = Du("Discontinuous", FieldMap(Map(
      "resolution" -> Du("Irregular", NotEnteredYet),
      "hiatuses" -> VmList(Seq(0 -> Du("Hiatus", FieldMap(Map(
        "oldest" -> Value(Num(122.0)),
        "youngest" -> Value(Num(143.0))))))))))
    assert(ok(createFromViewModel(individualTimelineNode, vm)) ===
      """{"Discontinuous":["Irregular",[{"Hiatus":[122.0,143.0]}]]}""")
  }

  // ``works with option types`` — LabNumber is absent from the map; the
  // reference's createFromViewModel would error yet its own test expects
  // None (Forms.scala header documents siding with the test)
  test("option types: IndividualDateNode with absent optional field") {
    val vm = FieldMap(Map(
      "Date" -> Du("RadiocarbonCalibrated", FieldMap(Map(
        "calibratedDate" -> FieldMap(Map(
          "CalibratedDate" -> Value(Num(2000.0)),
          "CalibrationCurve" -> Value(Txt("IntCal17")),
          "UncalibratedDate" -> Du("None", NotEnteredYet)))))),
      "MeasurementError" -> Du("NoDatingErrorSpecified", NotEnteredYet),
      "Discarded" -> Value(Bool(false)),
      "MaterialDated" -> Value(Txt("leaves")),
      "SampleDepth" -> Du("Some", Du("DepthPoint", FieldMap(Map(
        "depth" -> Value(Num(20.0))))))))
    val json = ok(createFromViewModel(individualDateNode, vm))
    assert(json ===
      """{"Date":{"RadiocarbonCalibrated":{"CalibratedDate":2000.0,""" +
      """"CalibrationCurve":"IntCal17"}},""" +
      """"MeasurementError":"NoDatingErrorSpecified","MaterialDated":"leaves",""" +
      """"SampleDepth":{"DepthPoint":20.0},"Discarded":false}""")
  }

  // ``works for spatial types`` — latitude entered as TEXT, parsed by
  // TryCreate (the reference test enters "56"/"-170")
  test("spatial types: ContextNode") {
    val vm = FieldMap(Map(
      "Name" -> Value(Txt("Brooks Range")),
      "SamplingLocation" -> Du("Site", FieldMap(Map(
        "latitude" -> Value(Txt("56")),
        "longitude" -> Value(Txt("-170"))))),
      "SampleOrigin" -> Du("LakeSediment", Du("DepthRangeNotStated", NotEnteredYet)),
      "SampleLocationDescription" -> Du("None", NotEnteredYet)))
    assert(ok(createFromViewModel(contextNode, vm)) ===
      """{"Name":"Brooks Range","SamplingLocation":{"Site":[56.0,-170.0]},""" +
      """"SampleOrigin":{"LakeSediment":"DepthRangeNotStated"}}""")
  }

  test("constructed IndividualDateNode JSON round-trips through the Payloads codec") {
    import spark.implicits._
    val vm = FieldMap(Map(
      "Date" -> Du("RadiocarbonCalibrated", FieldMap(Map(
        "calibratedDate" -> FieldMap(Map(
          "CalibratedDate" -> Value(Num(2000.0)),
          "CalibrationCurve" -> Value(Txt("IntCal17")),
          "UncalibratedDate" -> Du("None", NotEnteredYet)))))),
      "MeasurementError" -> Du("DatingErrorPlusMinus", Value(Num(35.0))),
      "Discarded" -> Value(Bool(false)),
      "MaterialDated" -> Value(Txt("leaves")),
      "SampleDepth" -> Du("Some", Du("DepthPoint", FieldMap(Map(
        "depth" -> Value(Num(20.0)))))),
      "LabNumber" -> Du("Some", Value(Txt("Lu-1098")))))
    val json = ok(createFromViewModel(individualDateNode, vm))
    val typed = Seq(json).toDF("payload")
      .select(Payloads.decodeIndividualDate(col("payload")).as("t"))
      .select(col("t.date.case").as("c"), col("t.date.calibrated.calibratedDate").as("cal"),
        col("t.measurementError.error").as("err"), col("t.materialDated").as("mat"),
        col("t.sampleDepth.depth").as("dep"), col("t.labNumber").as("lab"),
        col("t.discarded").as("disc"))
      .head()
    assert(typed.getString(0) === "RadiocarbonCalibrated")
    assert(typed.getDouble(1) === 2000.0)
    assert(typed.getDouble(2) === 35.0)
    assert(typed.getString(3) === "leaves")
    assert(typed.getDouble(4) === 20.0)
    assert(typed.getString(5) === "Lu-1098")
    assert(typed.getBoolean(6) === false)
  }

  // ---- the reference's error strings

  test("unknown DU case errors with the reference string") {
    assert(err(createFromViewModel(taxonNode, Du("Fungus", NotEnteredYet))) ===
      "The DU case Fungus does not exist on this type.")
  }

  test("fieldless view model on a field-carrying case") {
    assert(err(createFromViewModel(taxonNode, Du("Family", NotEnteredYet))) ===
      "No DU information selected.")
  }

  test("missing DU field") {
    val vm = Du("Subspecies", FieldMap(Map("generic" -> Value(Txt("Betula")))))
    assert(err(createFromViewModel(taxonNode, vm)) ===
      "Value not found for DU field specific")
  }

  test("missing required record field") {
    val vm = FieldMap(Map("Name" -> Value(Txt("Brooks Range"))))
    assert(err(createFromViewModel(contextNode, vm)) ===
      "No data has been entered for: SamplingLocation")
  }

  test("top-level NotEnteredYet") {
    assert(err(createFromViewModel(contextNode, NotEnteredYet)) ===
      "No data has been entered yet")
  }

  test("scalar validation propagates TryCreate errors") {
    val vm = FieldMap(Map(
      "Name" -> Value(Txt("Brooks Range")),
      "SamplingLocation" -> Du("Site", FieldMap(Map(
        "latitude" -> Value(Num(95.0)),
        "longitude" -> Value(Num(-170.0))))),
      "SampleOrigin" -> Du("Subfossil", NotEnteredYet)))
    assert(err(createFromViewModel(contextNode, vm)) ===
      "Latitude must be between -90 and 90 degrees")
  }

  test("empty short text is rejected") {
    val vm = Du("Family", FieldMap(Map("name" -> Value(Txt("")))))
    assert(err(createFromViewModel(taxonNode, vm)).nonEmpty)
  }
}
