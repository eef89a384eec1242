package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** F5 goldens — byte-equal display names for every `DisplayName()` case
  * (reference `Graph.fs:251-365`), one golden per node type / case.
  */
class RefDisplaySpec extends AnyFunSuite {

  test("author display joins initials with '. ' and no trailing dot (Types.fs:297-299)") {
    assert(RefDisplay.author("Smith", Seq('J', 'A')) == "Smith, J. A")
    assert(RefDisplay.author("Smith", Seq('J')) == "Smith, J")
    assert(RefDisplay.author("Smith", Seq.empty) == "Smith, ")
  }

  test("author lists: empty marker, join, and 5+et-al truncation (Types.fs:300-309)") {
    assert(RefDisplay.authorList(Seq.empty) == "Unknown author(s)")
    assert(RefDisplay.authorList(Seq(("Smith", Seq('J')), ("Doe", Seq('A', 'B')))) ==
      "Smith, J; Doe, A. B")
    val six = (1 to 6).map(i => (s"A$i", Seq('X')))
    assert(RefDisplay.authorListTruncated(six, 5) ==
      "A1, X; A2, X; A3, X; A4, X; A5, X et al.")
    assert(RefDisplay.authorListTruncated(six.take(5), 5) ==
      "A1, X; A2, X; A3, X; A4, X; A5, X")
  }

  test("biotic proxy displays (Graph.fs:255-269)") {
    assert(RefDisplay.ancientDna("Salix herbacea") == "aDNA: Salix herbacea")
    assert(RefDisplay.contemporaneousWholeOrganism("Betula nana") ==
      "Contemporaneous Whole Organism: Betula nana")
    assert(RefDisplay.megafossil("Trunk", "Pinus sylvestris") ==
      "Megafossil: Pinus sylvestris (Trunk)")
    assert(RefDisplay.macrofossil("Seed", "Carex") == "Macrofossil: Carex (Seed)")
    assert(RefDisplay.microfossil("Diatom", "Navicula") == "Morphotype: Diatom - Navicula")
    assert(RefDisplay.microfossil("PlantMacrofossil", "Dryas leaf") ==
      "Morphotype: Plant Macrofossil - Dryas leaf") // display splits the words
    assert(RefDisplay.microfossil("Pollen", "Betula") == "Morphotype: Pollen - Betula")
    assert(RefDisplay.microfossilOther("Chironomid", "Head capsule") ==
      "Morphotype: Chironomid - Head capsule")
  }

  test("category node renders the union case structurally (Graph.fs:270)") {
    assert(RefDisplay.category("Fossil", "Mammalia") == "Fossil Mammalia")
    assert(RefDisplay.category("Microfossil", "Pollen") == "Microfossil Pollen")
    assert(RefDisplay.categoryOtherProxy("Charcoal") == "OtherProxy (ShortText \"Charcoal\")")
  }

  test("taxonomy displays across all ranks (Graph.fs:272-288)") {
    assert(RefDisplay.taxonLife == "Life")
    assert(RefDisplay.taxonRank("Kingdom", "Plantae") == "Plantae [Kingdom]")
    assert(RefDisplay.taxonRank("Subfamily", "Betuloideae") == "Betuloideae [Sub-Family]")
    assert(RefDisplay.taxonRank("Subtribe", "Betulinae") == "Betulinae [Sub-Tribe]")
    assert(RefDisplay.taxonRank("Subgenus", "Strobus") == "Strobus [Sub-Genus]")
    assert(RefDisplay.taxonSpecies("Salix", "herbacea", "L.") ==
      "Salix herbacea L. [Species]")
    assert(RefDisplay.taxonSubspecies("Betula", "nana", "exilis", "(Sukaczev) Hultén") ==
      "Betula nana subsp. exilis (Sukaczev) Hultén [Subspecies]")
    assert(RefDisplay.taxonVariety("Poa", "alpina", "vivipara", "(L.) Arcang.") ==
      "Poa alpina var. vivipara (L.) Arcang. [Variety]")
    assert(RefDisplay.namesIndex("Salix herbacea L.") == "Salix herbacea L.")
  }

  test("inference method displays (Graph.fs:289-296)") {
    assert(RefDisplay.inferenceImplicit == "Implicit")
    assert(RefDisplay.atlas("Moore et al. 1991") ==
      "Explicit: Atlas or Key - Moore et al. 1991")
    assert(RefDisplay.implicitByExpert("Willis", "KJ") ==
      "Implicit: Expert ID - Willis, KJ")
    assert(RefDisplay.taxonomicNomenclature("Flora Europaea") ==
      "Explicit (nomenclature): from Flora Europaea")
    assert(RefDisplay.morphotypeTerminology("Birks 1980") ==
      "Explicit (terminology): from Birks 1980")
    assert(RefDisplay.referenceCollection("National Pollen Set", "Oxford") ==
      "Explicit: National Pollen Set (reference collection at Oxford)")
  }

  test("hyperedge, context, and the vernacular hole (Graph.fs:297-300)") {
    assert(RefDisplay.proxiedTaxon == "[Proxied taxon hyper-edge]")
    assert(RefDisplay.context("Site", "Lake Vatn") == "Site: Lake Vatn")
    intercept[NotImplementedError](RefDisplay.vernacular())
  }

  test("digitised dataset display (Graph.fs:301-303)") {
    assert(RefDisplay.digitisedDataset("Doe 2020") == "Digitised dataset from Doe 2020")
  }

  test("legacy source displays incl. '?' markers (Graph.fs:308-318)") {
    assert(RefDisplay.bibliographic(Some("Smith, John"), Some(1999), Some("A pollen record")) ==
      "Smith, John (1999). A pollen record")
    assert(RefDisplay.bibliographic(None, None, None) == "? (?). ?")
    assert(RefDisplay.greyLiterature("Field notes") == "Grey literature source: Field notes")
    assert(RefDisplay.darkData("Brown") == "'Dark data' from Brown")
    assert(RefDisplay.database("Global Biodiversity Information Facility") ==
      "Database: Global Biodiversity Information Facility")
    assert(RefDisplay.databaseEntry("GBIF", "obs/12345") ==
      "Database: GBIF - entry obs/12345")
  }

  test("book displays: ISBN wins, else ISSN/DOI, else empty tail (Graph.fs:322-328)") {
    val authors = Seq(("Smith", Seq('J')), ("Doe", Seq('A')))
    assert(RefDisplay.book(authors, 2004, "Arctic Shrubs", Some("978-0-00-000000-0"), Some("x")) ==
      "Smith, J; Doe, A (2004). [book] Arctic Shrubs. 978-0-00-000000-0 (ISBN)")
    assert(RefDisplay.book(authors, 2004, "Arctic Shrubs", None, Some("10.1000/x")) ==
      "Smith, J; Doe, A (2004). [book] Arctic Shrubs. 10.1000/x (ISSN/DOI)")
    assert(RefDisplay.book(Seq.empty, 2004, "Arctic Shrubs", None, None) ==
      "Unknown author(s) (2004). [book] Arctic Shrubs. ")
    assert(RefDisplay.bookChapter(authors, "Mosses") ==
      "Smith, J; Doe, A. [book chapter] Mosses")
  }

  test("dissertation, dataset, journal displays (Graph.fs:329-342)") {
    assert(RefDisplay.dissertation("Nguyen", Seq('T', 'H'), 2018, "Holocene dynamics") ==
      "Nguyen, T. H (2018). [dissertation] Holocene dynamics")
    assert(RefDisplay.individualDataset(Seq(("Hughes", Seq('A'))), None, "Tree density") ==
      "Hughes, A (Unknown year). [dataset] Tree density.")
    val six = (1 to 6).map(i => (s"A$i", Seq('X')))
    assert(RefDisplay.journalArticle(six, 2020, "Tree rings", "Nature") ==
      "A1, X; A2, X; A3, X; A4, X; A5, X et al. (2020). Tree rings. Nature")
  }

  test("grey-literature and dark-data source displays (Graph.fs:343-355)") {
    assert(RefDisplay.greyLiteratureSource(Seq(("Lee", Seq('J'))), None, "PDF",
      "Field notes", Some("Oxford")) ==
      "Lee, J (Unknown year). [grey|PDF] Field notes. Oxford")
    assert(RefDisplay.greyLiteratureSource(Seq.empty, Some(2010), "Blog", "Obs", None) ==
      "Unknown author(s) (2010). [grey|Blog] Obs")
    val longDetails = "x" * 60
    assert(RefDisplay.darkDataSource(Seq(("Brown", Seq('A'))), Some("Counts"), longDetails) ==
      s"Brown, A unpublished. [dataset] Counts. ${"x" * 50}")
    assert(RefDisplay.darkDataSource(Seq(("Brown", Seq('A'))), None, "short") ==
      "Brown, A unpublished. [dataset] short")
  }

  test("exposure displays incl. fixed-text guid nodes (Graph.fs:356-362)") {
    assert(RefDisplay.year(11650) == "11650 cal yr BP")
    assert(RefDisplay.year(-50) == "-50 cal yr BP")
    assert(RefDisplay.sliceLabel("Holocene", "GSSP") == "Holocene (designated by: GSSP)")
    assert(RefDisplay.timeline == "A study timeline")
    assert(RefDisplay.individualDate == "An individual date")
    assert(RefDisplay.outOfScopeLabel("Pre-Holocene", "GSSP") ==
      "Pre-Holocene (designated by: GSSP)")
    assert(RefDisplay.dateCalibration == "Recalibration of one to many radiocarbon dates")
  }

  test("outcome displays render the union case (Graph.fs:363-365)") {
    Seq("Abundance", "DiversityBeta", "Evenness", "PresenceOnly", "PresenceAbsence", "Richness")
      .foreach(c => assert(RefDisplay.measure(c) == c))
    assert(RefDisplay.customMeasure("Functional diversity") ==
      "OtherBiodiversityDimension (ShortText \"Functional diversity\")")
    intercept[IllegalArgumentException](RefDisplay.measure("Unknown"))
  }
}
