package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-trips FSharpLu compact-union fixtures (shaped exactly as the
  * reference serializes them — `Types.fs:544-657`, `Exposure.fs:87-105`,
  * `Datasets.fs:139-166`) through the typed codecs: decode → typed
  * struct → encode must reproduce the document (semantic JSON equality
  * via Jackson trees), and the typed struct must expose usable fields.
  */
class PayloadsSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def roundTrip(fixtures: Seq[String],
                        decode: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                        encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    import spark.implicits._
    val df = fixtures.toDF("payload")
      .withColumn("typed", decode(col("payload")))
      .withColumn("encoded", encode(col("typed")))
    val rows = df.select("payload", "encoded").collect()
    rows.foreach { r =>
      val (orig, enc) = (r.getString(0), r.getString(1))
      assert(enc != null, s"encode returned null for: $orig")
      assert(mapper.readTree(enc) == mapper.readTree(orig),
        s"round-trip mismatch:\n  in:  $orig\n  out: $enc")
    }
    df
  }

  private val dateFixtures = Seq(
    // uncalibrated date, +/- error, depth band, lab number
    """{"Date":{"RadiocarbonUncalibrated":9340.0},"MeasurementError":{"DatingErrorPlusMinus":50.0},""" +
      """"MaterialDated":"leaves","SampleDepth":{"DepthBand":[10.0,12.0]},"LabNumber":"Lu-3272","Discarded":false}""",
    // calibrated RANGES with nested uncal date + sigma error; field-less
    // depth case; LabNumber=None omitted
    """{"Date":{"RadiocarbonCalibratedRanges":{"CalibratedDate":[{"Sigma":"TwoSigma","EarlierBound":11250.0,""" +
      """"LaterBound":10850.0},{"Sigma":"OneSigma","EarlierBound":11100.0,"LaterBound":10950.0}],""" +
      """"CalibrationCurve":"IntCal20","UncalibratedDate":{"Date":9850.0,"UncalibratedDateError":""" +
      """{"DatingErrorPlusMinusSigma":["OneSigma",60.0]}}}},"MeasurementError":"NoDatingErrorSpecified",""" +
      """"MaterialDated":"ostracod shells","SampleDepth":"DepthNotStated","Discarded":true}""",
    // Tephra: multi-field case (name + nested OldDate union), range-sigma
    // error, qualitative depth level
    """{"Date":{"Tephra":["Hekla-4",{"CalYrBP":{"CalibratedDate":4260.0,"CalibrationCurve":"Clark 1975"}}]},""" +
      """"MeasurementError":{"DatingErrorRangeSigma":["ThreeSigma",120.0,80.0]},"MaterialDated":"tephra layer",""" +
      """"SampleDepth":{"DepthQualitativeLevel":"Thule"},"LabNumber":"AAR-852","Discarded":false}""",
    // Lead210 concentration dating with a BP old-date; point depth
    """{"Date":{"Lead210":[12.5,{"BP":150.0}]},"MeasurementError":"NoDatingErrorSpecified",""" +
      """"MaterialDated":"sediment","SampleDepth":{"DepthPoint":4.5},"Discarded":false}""",
    // collection date (simple scalar case)
    """{"Date":{"CollectionDate":1987.0},"MeasurementError":"NoDatingErrorSpecified",""" +
      """"MaterialDated":"living wood","Discarded":false}""",
    // free text with embedded newline/tab/quote — jsonString must
    // re-escape what get_json_object unescaped
    """{"Date":{"DepositionalZone":"Zone \"B\"\n\tupper"},"MeasurementError":"NoDatingErrorSpecified",""" +
      """"MaterialDated":"bulk\nsediment","Discarded":false}""",
    // control characters beyond \n\r\t: backspace, form feed, U+0001 —
    // re-encoded via the generic \u00XX arm (raw control bytes would be
    // invalid JSON); Jackson-tree equality accepts \\u0008 for \\b
    """{"Date":{"DepositionalZone":"zone""" + "\\b\\f\\u0001" +
      """end"},"MeasurementError":"NoDatingErrorSpecified","MaterialDated":"peat","Discarded":false}""")

  test("IndividualDateNode round-trips and exposes typed fields (ref Types.fs:544-657)") {
    val df = roundTrip(dateFixtures,
      Payloads.decodeIndividualDate, Payloads.encodeIndividualDate)
    val typed = df.select(
      col("typed.date.case").as("dcase"),
      col("typed.date.uncal"),
      col("typed.date.oldDate.case").as("odcase"),
      col("typed.measurementError.sigma"),
      col("typed.sampleDepth.lower"),
      col("typed.labNumber"),
      col("typed.discarded")).collect()
    assert(typed(0).getAs[String]("dcase") == "RadiocarbonUncalibrated")
    assert(typed(0).getAs[Double]("uncal") == 9340.0)
    assert(typed(0).getAs[Double]("lower") == 10.0)
    assert(typed(0).getAs[String]("labNumber") == "Lu-3272")
    assert(typed(1).getAs[String]("dcase") == "RadiocarbonCalibratedRanges")
    assert(typed(1).getAs[Boolean]("discarded"))
    assert(typed(2).getAs[String]("dcase") == "Tephra")
    assert(typed(2).getAs[String]("odcase") == "CalYrBP")
    assert(typed(2).getAs[String]("sigma") == "ThreeSigma")
    assert(typed(3).getAs[String]("odcase") == "BP")
    // the calibrated-ranges list is typed, not stringly
    val ranges = df.select(col("typed.date.ranges.ranges")).collect()(1)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(ranges.map(_.getAs[String]("Sigma")) == Seq("TwoSigma", "OneSigma"))
    assert(ranges.head.getAs[Double]("EarlierBound") == 11250.0)
  }

  private val calibrationFixtures = Seq(
    // OxCal model with escaped quotes in the script; reanalysis origin
    // (fields-serialized Author + date tuple); age-depth model where one
    // point has no standard deviation (None omitted)
    """{"CalibrationCurve":"IntCal20","ModelApplied":{"OxCalModel":"Curve(\"IntCal20\");"},""" +
      """"SoftwareName":"OxCal","SoftwareVersion":"4.4","Origin":{"PartOfReanalysis":""" +
      """[{"item1":["A","B"],"item2":"Smith","item3":null},"2024-10-24"]},""" +
      """"AgeDepthModel":[{"Depth":10.0,"Date":1234.0,"StandardDeviation":45.0},{"Depth":20.0,"Date":2345.0}]}""",
    // all the field-less cases + no age-depth model
    """{"CalibrationCurve":"IntCal13","ModelApplied":"Unmodelled","SoftwareName":"CALIB",""" +
      """"SoftwareVersion":"7.1","Origin":"FromOriginalWork"}""",
    // corporate author: EMPTY initials list must round-trip as [] not [""]
    """{"CalibrationCurve":"IntCal20","ModelApplied":"Unmodelled","SoftwareName":"OxCal",""" +
      """"SoftwareVersion":"4.4","Origin":{"PartOfReanalysis":""" +
      """[{"item1":[],"item2":"Arctic Consortium","item3":null},"2025-01-01"]}}""")

  test("DateCalibrationNode round-trips and exposes typed fields (ref Exposure.fs:87-105)") {
    val df = roundTrip(calibrationFixtures,
      Payloads.decodeDateCalibration, Payloads.encodeDateCalibration)
    val typed = df.select(
      col("typed.model.case").as("mcase"),
      col("typed.origin.case").as("ocase"),
      col("typed.origin.conductedBy.item2").as("author"),
      col("typed.ageDepthModel")).collect()
    assert(typed(0).getAs[String]("mcase") == "OxCalModel")
    assert(typed(0).getAs[String]("ocase") == "PartOfReanalysis")
    assert(typed(0).getAs[String]("author") == "Smith")
    assert(typed(0).getSeq[org.apache.spark.sql.Row](3).size == 2)
    assert(typed(1).getAs[String]("mcase") == "Unmodelled")
    assert(typed(1).getAs[String]("ocase") == "FromOriginalWork")
    assert(typed(1).isNullAt(3))
  }

  private val digitisedFixtures = Seq(
    // named cases + int-carrying unit + raw data table passthrough
    """{"WhatWasDigitised":{"FromFigure":3},"SoftwareUsed":"PlotDigitizer","Metric":"Abundance",""" +
      """"Units":{"CountPerCmCubed":100},"DigitisedBy":{"item1":["J"],"item2":"Doe","item3":null},""" +
      """"DigitisedOn":"2024-10-24","DataTable":{"Index":[0.0,10.0],"IndexUnit":"Depths",""" +
      """"Morphotypes":["Betula"],"Data":[[1.0],[2.0]]}}""",
    // text-carrying cases, suffix author, optional Dimensions present
    """{"WhatWasDigitised":{"FromSupplementaryTable":"S2"},"SoftwareUsed":{"OtherSoftware":"WebPlotDigitizer"},""" +
      """"Metric":{"OtherMetric":"influx"},"Units":{"OtherUnit":"grains cm-2 yr-1"},""" +
      """"DigitisedBy":{"item1":["M","C"],"item2":"O'Neil","item3":"Jr"},"DigitisedOn":"2023-01-02",""" +
      """"DataTable":{"Index":[5.0],"IndexUnit":{"Ages":"CalYrBP"},"Morphotypes":["Salix"],"Data":[[3.0]]},""" +
      """"Dimensions":{"Index":[5.0],"IndexUnit":"Depths","Morphotypes":["pollen sum"],"Data":[[400.0]]}}""")

  test("DigitisedDatasetNode round-trips and exposes typed fields (ref Datasets.fs:139-166)") {
    val df = roundTrip(digitisedFixtures,
      Payloads.decodeDigitisedDataset, Payloads.encodeDigitisedDataset)
    val typed = df.select(
      col("typed.location.case").as("lcase"),
      col("typed.location.number"),
      col("typed.units.cm3"),
      col("typed.digitisedBy.item2").as("digitiser"),
      col("typed.dimensions")).collect()
    assert(typed(0).getAs[String]("lcase") == "FromFigure")
    assert(typed(0).getAs[Int]("number") == 3)
    assert(typed(0).getAs[Int]("cm3") == 100)
    assert(typed(0).getAs[String]("digitiser") == "Doe")
    assert(typed(0).isNullAt(4)) // Dimensions=None
    assert(typed(1).getAs[String]("lcase") == "FromSupplementaryTable")
    assert(typed(1).getAs[String]("digitiser") == "O'Neil")
    assert(typed(1).getString(4) != null)
  }

  test("unionCase distinguishes field-less and object cases") {
    import spark.implicits._
    val df = Seq("NoDatingErrorSpecified", """{"DatingErrorPlusMinus":50.0}""", null)
      .toDF("raw").withColumn("c", Payloads.unionCase(col("raw")))
    assert(df.select("c").collect().map(_.getString(0)).toSeq ==
      Seq("NoDatingErrorSpecified", "DatingErrorPlusMinus", null))
  }

  test("PROPERTY: any unicode free text survives decode -> encode, judged by Jackson") {
    import spark.implicits._
    import org.scalacheck.Gen
    // generator biased toward the hostile ranges: every C0 control char,
    // JSON metacharacters, high-BMP text, and non-BMP (surrogate-paired)
    // code points; unpaired surrogates excluded (not valid strings)
    val charGen: Gen[String] = Gen.frequency(
      4 -> Gen.asciiPrintableChar.map(_.toString),
      3 -> Gen.choose(0x0000, 0x001f).map(_.toChar.toString),
      2 -> Gen.oneOf("\"", "\\", "/", "\n", "\r", "\t", "\b", "\f"),
      2 -> Gen.choose(0x00a0, 0xd7ff).map(_.toChar.toString),
      1 -> Gen.oneOf("😀", "🦄", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢"))
    val strGen = Gen.listOfN(24, charGen).map(_.mkString)
    val seed0 = org.scalacheck.rng.Seed(20260813L)
    val samples = Iterator.iterate(seed0)(_.next).take(200)
      .flatMap(s => strGen.apply(Gen.Parameters.default, s)).toSeq :+
      "" :+ " " :+ "plain"
    // Jackson writes the reference-side document; the codec must read the
    // exact value back out, and its own re-encoding must parse under
    // Jackson to the identical tree (escaping-complete in BOTH directions)
    val raws = samples.map { s =>
      s -> s"""{"DepositionalZone":${mapper.writeValueAsString(s)}}"""
    }
    val out = raws.map(_._2).toDF("raw")
      .withColumn("typed", Payloads.decodeDatingMethod(col("raw")))
      .select(col("raw"), col("typed.name").as("name"),
        Payloads.encodeDatingMethod(col("typed")).as("reenc"))
      .collect()
    out.zip(raws).foreach { case (r, (s, raw)) =>
      assert(r.getString(1) == s,
        s"decode lost the value: in=${mapper.writeValueAsString(s)} got=${r.getString(1)}")
      assert(mapper.readTree(r.getString(2)) == mapper.readTree(raw),
        s"re-encode not Jackson-equal: in=$raw out=${r.getString(2)}")
    }
  }
}
