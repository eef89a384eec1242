package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  val bib: String =
    """@article{smith1987,
      |author = {Smith, J. A.},
      |title = {The example title},
      |journal = {Journal of Examples},
      |year = 1987,
      |volume = {12},
      |number = {3},
      |pages = {20--24},
      |month = {jan}}
      |@article{jones1990,
      |author = {Jones, B.},
      |title = {Another title},
      |journal = {J. Other},
      |year = 1990,
      |volume = {1},
      |number = {1},
      |pages = {1--2},
      |month = {feb}}
      |""".stripMargin

  test("S8 BibTeX parse extracts all fields of the reference record shape") {
    val rows = Ingest.parseBibtex(spark, bib).orderBy("citekey").collect()
    assert(rows.length == 2)
    val r = rows.find(_.getString(0) == "smith1987").get
    assert(r.getAs[String]("author") == "Smith, J. A.")
    assert(r.getAs[String]("title") == "The example title")
    assert(r.getAs[String]("journal") == "Journal of Examples")
    assert(r.getAs[Int]("year") == 1987)
    assert(r.getAs[String]("pages") == "20--24")
    assert(r.getAs[String]("month") == "jan")
  }

  test("S8 malformed input yields no records, no crash") {
    assert(Ingest.parseBibtex(spark, "not bibtex at all").count() == 0)
    assert(Ingest.parseBibtex(spark, "").count() == 0)
  }

  test("S8 multi-line braced values are joined with single spaces; bare values parse") {
    val bib =
      """@article{wrap2001,
        |  author = {Long, A. B. and
        |            Other, C. D.},
        |  title = {A title that
        |     wraps over three
        |     whole lines},
        |  journal = {Journal of {Nested} Braces},
        |  volume = 12,
        |  year = {2001},
        |}""".stripMargin
    val r = Ingest.parseBibtex(spark, bib).head()
    assert(r.getAs[String]("author") == "Long, A. B. and Other, C. D.")
    assert(r.getAs[String]("title") == "A title that wraps over three whole lines")
    assert(r.getAs[String]("journal") == "Journal of {Nested} Braces")
    assert(r.getAs[String]("volume") == "12")
    assert(r.getAs[Int]("year") == 2001)
  }

  test("S8 double-braced values and capitalized field names parse correctly") {
    val bib =
      """@article{corp1999,
        |  Author = {{Van Der Berg Institute}},
        |  Title = {Ecology of {Salix} habitats},
        |  Year = {1999},
        |  Pages = {10--20},
        |}""".stripMargin
    val r = Ingest.parseBibtex(spark, bib).head()
    assert(r.getAs[String]("author") == "{Van Der Berg Institute}")
    assert(r.getAs[String]("title") == "Ecology of {Salix} habitats")
    assert(r.getAs[Int]("year") == 1999)
    assert(r.getAs[String]("pages") == "10--20")
  }

  test("S12 morphotype headers with quotes and backticks survive the unpivot") {
    import spark.implicits._
    val wide = Seq((0.0, 1.0, 2.0), (5.0, 3.0, 4.0))
      .toDF("depth", "O'Brien type", "weird`name")
    val long = Ingest.dataTableLong(wide).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2))).toSet
    assert(long == Set((0.0, "O'Brien type", 1.0), (0.0, "weird`name", 2.0),
      (5.0, "O'Brien type", 3.0), (5.0, "weird`name", 4.0)))
  }

  test("S9 Colandr sync filters to included citations") {
    import spark.implicits._
    val csv = Seq(
      ("included", "T1", "A1", "auth1", "J1", "2", "1999"),
      ("excluded", "T2", "A2", "auth2", "J2", "3", "2000"),
      ("included", "T3", "A3", "auth3", "J3", "4", "2001")
    ).toDF("citation_screening_status", "citation_title", "citation_abstract",
      "citation_authors", "citation_journal_name", "citation_journal_volume",
      "citation_pub_year")
    val out = Ingest.colandrIncluded(csv).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("title")).toSet == Set("T1", "T3"))
    assert(out.head.schema.fieldNames.contains("year"))
  }

  test("F11 index column classification (ref Datasets.fs:35-44)") {
    assert(Ingest.indexColumnType("depth") == "Depths")
    assert(Ingest.indexColumnType("BP") == "AgesBP")
    assert(Ingest.indexColumnType("Cal yr BP") == "AgesCalYrBP")
    assert(Ingest.indexColumnType("AD") == "AgesAD")
    assert(Ingest.indexColumnType("weird") startsWith "Unknown")
  }

  test("S12 wide data table unpivots to long format and pivots back (A5)") {
    import spark.implicits._
    val wide = Seq((10.0, 12.0, 3.5, 0.0), (20.0, 8.2, 4.1, 1.0))
      .toDF("depth", "Salix-type", "Betula", "Pinus")
    val long = Ingest.dataTableLong(wide)
    assert(long.count() == 6)
    val r = long.filter(col("depth") === 10.0 && col("morphotype") === "Betula").head()
    assert(r.getDouble(2) == 3.5)
    val back = Ingest.depthsPivot(long)
    assert(back.columns.toSet == Set("depth", "Salix-type", "Betula", "Pinus"))
    assert(back.count() == 2)
  }

  test("JSONL parse: valid lines round-trip, malformed and incomplete lines quarantine") {
    import spark.implicits._
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "source": "web"}""",
      """{"doc_id": 2, "text": "quote \" and tab \t inside", "source": "books"}""",
      """{broken json""",                       // malformed → all-null struct
      """{"doc_id": 3, "source": "no-text"}""", // missing text → invalid
      """{"text": "no id", "source": "x"}"""    // missing id → invalid
    ).toDF("line")
    val out = Ingest.parseJsonl(lines, col("line")).collect()
    assert(out.count(_.getBoolean(3)) == 2)
    val byId = out.filter(_.getBoolean(3)).map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == "hello world")
    assert(byId(2L) == "quote \" and tab \t inside") // escapes decoded
    assert(out.length == 5)                          // nothing dropped silently
  }
}
