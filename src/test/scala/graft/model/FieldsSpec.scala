package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FieldsSpec extends SparkSpec {
  import spark.implicits._

  test("F9 text constructors enforce reference bounds (Types.fs:204-214)") {
    assert(Fields.createShortText("x").isRight)
    assert(Fields.createShortText("a" * 100).isRight)
    assert(Fields.createShortText("a" * 101).isLeft)
    assert(Fields.createShortText("").isLeft)
    assert(Fields.createText("").isLeft)
    assert(Fields.createText("anything longer than 100 " * 10).isRight)
  }

  test("F9 DOI extracts from bare and URL forms (Types.fs:317-325)") {
    assert(Fields.createDoi("10.1126/science.aar3646").toOption.get.value ==
      "10.1126/science.aar3646")
    assert(Fields.createDoi("https://doi.org/10.1126/science.aar3646").toOption.get.value ==
      "10.1126/science.aar3646")
    assert(Fields.createDoi("not-a-doi").isLeft)
    assert(Fields.createDoi("10x1234/suffix").isLeft) // dot must be literal
  }

  test("F9 IntRange parses and orders; Percent bounds and x100 storage (Types.fs:343-372)") {
    assert(Fields.createIntRange("12 - 14").toOption.get == Fields.IntRange(12, 14))
    assert(Fields.createIntRange("14 - 12").toOption.get == Fields.IntRange(12, 14))
    assert(Fields.createIntRange("12-14").isLeft) // reference requires spaced hyphen
    assert(Fields.createPercent(0.5).toOption.get.valueTimes100 == 50.0)
    assert(Fields.createPercent(1.1).isLeft)
    assert(Fields.createPercent(-0.1).isLeft)
  }

  test("F9 geography bounds and DMS regex (Types.fs:399-414)") {
    assert(Fields.createLatitude(89.9).isRight)
    assert(Fields.createLatitude(89.91).isLeft)
    assert(Fields.createLongitude(-180.0).isRight)
    assert(Fields.createLongitude(-180.1).isLeft)
    assert(Fields.createCoordinateDms("40°26'46\"N,79°01'00\"W").isRight)
    assert(Fields.createCoordinateDms("40.5N,79W").isLeft)
    assert(Fields.createDepth(0.0).isRight)
    assert(Fields.createDepth(-0.1).isLeft)
  }

  test("F9 polygon WKT parse: >=3 bounds-checked lon-lat points (Types.fs:453-481)") {
    val ok = Fields.createPolygon("POLYGON((30 10, 40 40, 20 40, 30 10))")
    assert(ok.toOption.get.length == 4)
    assert(ok.toOption.get.head == (Fields.Latitude(10), Fields.Longitude(30)))
    assert(Fields.createPolygon("POLYGON((30 10, 40 40))").isLeft)  // too few
    assert(Fields.createPolygon("POLYGON((30 10, 40 95, 20 40))").isLeft) // lat out of range
    assert(Fields.createPolygon("nope").isLeft)
  }

  test("F10 asMonth maps 1-12 and rejects outside (Types.fs:661-674)") {
    assert(Fields.asMonth(1).contains("Jan") && Fields.asMonth(12).contains("Dec"))
    assert(Fields.asMonth(0).isEmpty && Fields.asMonth(13).isEmpty)
  }

  test("column-form checks partition valid/invalid rows with reasons") {
    val df = Seq(
      (1L, 60.0, 20.0, "ok name"),
      (2L, 95.0, 20.0, "bad lat"),
      (3L, 60.0, -200.0, ""),          // bad lon AND empty name
      (4L, -89.0, 180.0, "edge ok")
    ).toDF("id", "lat", "lon", "name")
    val (valid, invalid) = Fields.validate(df, Seq(
      "lat" -> Fields.latitudeOk(col("lat")),
      "lon" -> Fields.longitudeOk(col("lon")),
      "name" -> Fields.shortTextOk(col("name"))))
    assert(valid.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    val reasons = invalid.select(col("id"), col("failed_checks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(reasons == Map(2L -> Set("lat"), 3L -> Set("lon", "name")))
  }

  test("F12 data-table shape check accepts complete grids, rejects ragged ones") {
    import graft.sources.Ingest
    val complete = Seq((0.0, "a", 1.0), (0.0, "b", 2.0), (1.0, "a", 3.0), (1.0, "b", 4.0))
      .toDF("depth", "morphotype", "value")
    assert(Ingest.dataTableShapeOk(complete))
    assert(!Ingest.dataTableShapeOk(complete.limit(3)))        // missing cell
    assert(!Ingest.dataTableShapeOk(complete.unionAll(complete.limit(2)))) // dup cells
  }
}
