package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** F2 goldens — byte-equal keys for every `makeUniqueKey` case format
  * (reference `Graph.fs:371-543`). Each expected string is hand-derived
  * from the reference's sprintf + `safeString`/initials folds, including
  * the quirks (HtmlEncode-then-strip, surviving spaces/brackets, empty
  * segments, literal absent-field markers).
  */
class RefKeysSpec extends AnyFunSuite {

  // ----------------------------------------------------------- primitives

  test("safeString mirrors the reference: HtmlEncode first, A-z span keeps brackets/caret/backtick") {
    // '&' -> "&amp;" -> strip '&' and ';' -> "amp" survives
    assert(RefKeys.safeString("A&B") == "AampB")
    // [ ] ^ ` fall inside the A-z ASCII span of the reference's class
    assert(RefKeys.safeString("x[1]^`y`") == "x[1]^`y`")
    // é is HTML-encoded to &#233; then stripped to its digits
    assert(RefKeys.safeString("café") == "caf233")
    assert(RefKeys.safeString("a.b,c!d") == "abcd")
    assert(RefKeys.safeString(null) == "")
  }

  test("htmlEncode matches WebUtility.HtmlEncode ranges") {
    assert(RefKeys.htmlEncode("<a href='x'>&\"") == "&lt;a href=&#39;x&#39;&gt;&amp;&quot;")
    assert(RefKeys.htmlEncode("café") == "caf&#233;")
    assert(RefKeys.htmlEncode("中") == "中") // >= U+0100 passes through
    // non-BMP: .NET writes the surrogate PAIR as one decimal entity of
    // the full code point, so the digits survive safeString like é→233
    assert(RefKeys.htmlEncode("a😀b") == "a&#128512;b") // 😀
    assert(RefKeys.safeString("a😀b") == "a128512b")
    // lone surrogates become U+FFFD (stripped entirely by safeString)
    assert(RefKeys.htmlEncode("x\uD83Dy") == "x�y")
    assert(RefKeys.safeString("x\uD83Dy") == "xy")
  }

  test("the three initials folds differ exactly as in the reference") {
    assert(RefKeys.initials("A pollen record from (new) data") == "Aprfd") // '(' dropped
    assert(RefKeys.headChars("Survey of (unpublished) data") == "So(d")   // '(' kept
    assert(RefKeys.initials("") == "")
    // .NET Char.IsNumber accepts Nl/No (vulgar fractions, Roman
    // numerals, circled digits), not just Nd — the reference keeps them
    assert(RefKeys.initials("½ cup of Ⅻ things ① two") == "½coⅫt①t")
  }

  // ------------------------------------------------------ biotic proxies

  test("biotic proxy keys (Graph.fs:380-391)") {
    assert(RefKeys.ancientDna("Salix herbacea") == "bioticproxynode_adna_salix herbacea")
    assert(RefKeys.contemporaneousWholeOrganism("Betula nana L.") ==
      "bioticproxynode_direct_betula nana l")
    assert(RefKeys.megafossil("Trunk", "Pinus sylvestris") ==
      "bioticproxynode_morphotype_megafossil_pinus sylvestris_trunk") // fossil first
    assert(RefKeys.macrofossil("Seed", "Carex") ==
      "bioticproxynode_morphotype_macrofossil_carex_seed")
    assert(RefKeys.microfossil("Pollen", "Betula") ==
      "bioticproxynode_morphotype_pollen_betula")
    assert(RefKeys.microfossil("PlantMacrofossil", "Dryas leaf") ==
      "bioticproxynode_morphotype_plantmacrofossil_dryas leaf")
    assert(RefKeys.microfossilOther("Chironomid", "Head capsule #2") ==
      "bioticproxynode_morphotype_customgroup_chironomid_head capsule 2")
    intercept[IllegalArgumentException](RefKeys.microfossil("Chironomid", "x"))
  }

  test("biotic proxy category keys (Graph.fs:392-406)") {
    assert(RefKeys.categoryAncientDna("Plantae") == "bioticproxycategorynode_adna_plantae")
    assert(RefKeys.categoryContemporary("Aves") == "bioticproxycategorynode_contemporary_aves")
    assert(RefKeys.categoryFossil("Mammalia") == "bioticproxycategorynode_fossil_mammalia")
    assert(RefKeys.categoryOtherProxy("Charcoal") == "bioticproxycategorynode_fossil_charcoal")
    assert(RefKeys.categoryMicrofossil("Diatom") == "bioticproxycategorynode_fossilmicro_diatom")
    assert(RefKeys.categoryMicrofossil("Ostracod") == "bioticproxycategorynode_fossilmicro_ostracod")
    assert(RefKeys.categoryMicrofossil("PlantMacrofossil") ==
      "bioticproxycategorynode_fossilmicro_plantmacrofossil")
    assert(RefKeys.categoryMicrofossil("Pollen") == "bioticproxycategorynode_fossilmicro_pollen")
    assert(RefKeys.categoryMicrofossilOther("Testate amoebae") ==
      "bioticproxycategorynode_fossilmicro_other_testate amoebae")
  }

  // ------------------------------------------------------------- taxonomy

  test("taxonomy keys across all ranks (Graph.fs:408-422)") {
    assert(RefKeys.taxonLife == "taxonnode_life")
    assert(RefKeys.taxonRank("Kingdom", "Plantae") == "taxonnode_kingdom_plantae")
    assert(RefKeys.taxonRank("Phylum", "Tracheophyta") == "taxonnode_phylum_tracheophyta")
    assert(RefKeys.taxonRank("Class", "Pinopsida") == "taxonnode_class_pinopsida")
    assert(RefKeys.taxonRank("Clade", "Angiosperms") == "taxonnode_clade_angiosperms")
    assert(RefKeys.taxonRank("Order", "Fagales") == "taxonnode_order_fagales")
    assert(RefKeys.taxonRank("Family", "Betulaceae") == "taxonnode_family_betulaceae")
    assert(RefKeys.taxonRank("Subfamily", "Betuloideae") == "taxonnode_subfamily_betuloideae")
    assert(RefKeys.taxonRank("Tribe", "Betuleae") == "taxonnode_tribe_betuleae")
    assert(RefKeys.taxonRank("Subtribe", "Betulinae") == "taxonnode_subtribe_betulinae")
    assert(RefKeys.taxonRank("Genus", "Salix") == "taxonnode_genus_salix")
    assert(RefKeys.taxonRank("Subgenus", "Strobus") == "taxonnode_subgenus_strobus")
    assert(RefKeys.taxonSpecies("Salix", "herbacea", "L.") ==
      "taxonnode_species_salix_herbacea_l")
    intercept[IllegalArgumentException](RefKeys.taxonRank("Species", "x"))
  }

  test("subspecies/variety authorship is HTML-encoded but not stripped (Graph.fs:421-422)") {
    assert(RefKeys.taxonSubspecies("Betula", "nana", "exilis", "(Sukaczev) Hultén") ==
      "taxonnode_subspecies_betula_nana_exilis_(sukaczev) hult&#233;n")
    assert(RefKeys.taxonVariety("Poa", "alpina", "vivipara", "(L.) Arcang.") ==
      "taxonnode_variety_poa_alpina_vivipara_(l.) arcang.")
  }

  test("names-index and vernacular keys (Graph.fs:424-425,441)") {
    assert(RefKeys.namesIndex("Salix herbacea L.") ==
      "taxonomicnamesindexnode_nomenclature-index_salix herbacea l")
    assert(RefKeys.vernacular("English", "Dwarf willow") ==
      "vernaculartaxonlabelnode_english_dwarf willow")
  }

  // ------------------------------------------------------ inference methods

  test("inference method keys (Graph.fs:426-438)") {
    assert(RefKeys.inferenceImplicit == "inferencemethodnode_implicit")
    assert(RefKeys.atlas("Moore Webb & Collinson 1991") == "inferencemethodnode_atlas_mwc1")
    assert(RefKeys.atlasWithLookup("Moore Webb & Collinson 1991") ==
      "inferencemethodnode_atlas_lookup_mwc1")
    assert(RefKeys.implicitByExpert("Willis", "KJ") == "inferencemethodnode_expert_willis_kj")
    assert(RefKeys.taxonomicNomenclature("Flora Europaea volume 2") ==
      "inferencemethodnode_nomenclature_fev2")
    assert(RefKeys.morphotypeTerminology("Birks and Birks 1980 terminology") ==
      "inferencemethodnode_morphotypeterminology_bab1t")
    assert(RefKeys.referenceCollection("National Pollen Reference Set", "Oxford UK") ==
      "inferencemethodnode_referencecollection_nprs_ou")
  }

  // --------------------------------------------------------------- sources

  test("legacy bibliographic keys incl. absent-field markers (Graph.fs:451-458)") {
    assert(RefKeys.bibliographic(
      Some("Smith, John"), Some("A pollen record from northern Norway"), Some(1999)) ==
      "sourcenode_pub_smith_aprfnn_1999")
    assert(RefKeys.bibliographic(None, None, None) ==
      "sourcenode_pub_unknown_notitle_noyear")
  }

  test("legacy grey literature keeps raw surnames and punctuation heads (Graph.fs:459-463)") {
    assert(RefKeys.greyLiterature("Kovács", "Éva Mária", "Survey of (unpublished) data") ==
      "sourcenode_grey_kovács_ém_so(d")
  }

  test("legacy dark data: HtmlEncode artifacts survive in surnames (Graph.fs:464)") {
    // O'Neill -> O&#39;Neill -> strip &,#,; -> O39Neill
    assert(RefKeys.darkData("O'Neill", "Paul",
      "Unpublished diatom counts from lake cores 1987-1992") ==
      "sourcenode_darkdata_o39neill_paul_udcflc1")
  }

  test("database keys (Graph.fs:465-466)") {
    assert(RefKeys.database("GBIF") == "sourcenode_database_gbif")
    assert(RefKeys.databaseEntry("GBIF", "obs/12345") ==
      "sourcenode_database_gbif_entry_obs12345")
  }

  test("book and chapter keys incl. empty additional-author segment (Graph.fs:469-483)") {
    assert(RefKeys.book("van der Berg", Seq.empty, "The Ecology of Arctic Shrubs", 2004) ==
      "sourcenode_book_van der berg__teoas_2004") // double underscore: empty segment
    assert(RefKeys.book("Smith", Seq("Jones", "Brown"), "Arctic flora", 1987) ==
      "sourcenode_book_smith_jb_af_1987")
    assert(RefKeys.bookChapter("Smith", Seq("Jones", "Ábel"), "Chapter on mosses", 123) ==
      "sourcenode_book-chapter_smith_já_com_123")
  }

  test("published dataset keys incl. unk/single markers (Graph.fs:484-491)") {
    assert(RefKeys.individualDataset(
      Seq(("Hughes", "AC"), ("Roberts", "P")), Some(2015), "Global tree density") ==
      "sourcenode_published-dataset_hughes_ac_r_2015_gtd")
    assert(RefKeys.individualDataset(Seq.empty, None, "Orphan data") ==
      "sourcenode_published-dataset_unk_unk_single_unk_od")
  }

  test("dissertation and journal article keys (Graph.fs:492-507)") {
    assert(RefKeys.dissertation("Nguyen", "TH", 2018, "Holocene vegetation dynamics") ==
      "sourcenode_dissertation_nguyen_th_2018_hvd")
    assert(RefKeys.journalArticle("Doe", "Tree ring chronology of northern forests", 2020) ==
      "sourcenode_pub_doe_trconf_2020")
    // agreement with the engine's own publicationKey on the plain case
    assert(RefKeys.journalArticle("Doe", "Tree ring chronology of northern forests", 2020) ==
      Keys.publicationKey("doe", "Tree ring chronology of northern forests", 2020))
  }

  test("grey literature source: format lowercased before stripping (Graph.fs:508-515)") {
    assert(RefKeys.greyLiteratureSource("PDF", Seq(("Lee", "J")), None, "Field notes 2003") ==
      "sourcenode_greylit_pdf_lee_j_single_unk_fn2")
    assert(RefKeys.greyLiteratureSource("Blog", Seq(("Lee", "J"), ("Kim", "S")),
      Some(2010), "Observations") ==
      "sourcenode_greylit_blog_lee_j_k_2010_o")
  }

  test("dark data source keys (Graph.fs:516-523)") {
    assert(RefKeys.darkDataSource("Brown", "AB", Seq("Green", "White"), Some(1995),
      "Raw counts of beetle elytra") ==
      "sourcenode_darkdata_brown_ab_gw_1995_rcobe")
    assert(RefKeys.darkDataSource("Brown", "AB", Seq.empty, None, "Raw data") ==
      "sourcenode_darkdata_brown_ab__unk_rd")
  }

  // -------------------------------------------------------------- exposure

  test("exposure keys: years and slice labels keep reference spaces (Graph.fs:525-532)") {
    assert(RefKeys.year(11650) == "calyearnode_11650ybp")
    assert(RefKeys.year(-50) == "calyearnode_-50ybp")
    assert(RefKeys.sliceLabel("Holocene", "Global Stratotype Section and Point") ==
      "qualitativelabelnode_holocene_by_global stratotype section and point")
    assert(RefKeys.outOfScopeLabel("Pre-Holocene", "GSSP") ==
      "qualitativelabeloutofscopenode_pre-holocene_by_gssp")
    // engine's path-safe variant of the same label, for contrast
    assert(Keys.qualitativeLabelKey("Holocene", "Global Stratotype Section and Point") ==
      "qualitativelabelnode_holocene_by_global_stratotype_section_and_point")
  }

  // --------------------------------------------------------------- outcomes

  test("outcome measure keys incl. custom (Graph.fs:533-543)") {
    assert(RefKeys.measure("Abundance") == "biodiversitydimensionnode_abundance")
    assert(RefKeys.measure("DiversityBeta") == "biodiversitydimensionnode_beta_diversity")
    assert(RefKeys.measure("Evenness") == "biodiversitydimensionnode_evenness")
    assert(RefKeys.measure("PresenceOnly") == "biodiversitydimensionnode_presence")
    assert(RefKeys.measure("PresenceAbsence") == "biodiversitydimensionnode_presence_absence")
    assert(RefKeys.measure("Richness") == "biodiversitydimensionnode_richness")
    assert(RefKeys.customMeasure("Functional diversity (FD)") ==
      "biodiversitydimensionnode_custom_functional diversity fd")
    intercept[IllegalArgumentException](RefKeys.measure("Unknown"))
  }

  // ------------------------------------------------------------ guid-keyed

  test("guid-keyed types route through Keys.uuidKey (Graph.fs:439-444,529-532)") {
    val u = java.util.UUID.fromString("00000000-0000-4000-8000-000000000001")
    assert(Keys.uuidKey(NodeTypes.ProxiedTaxonNode, u) ==
      "proxiedtaxonnode_00000000-0000-4000-8000-000000000001")
    assert(Keys.parseKey(Keys.uuidKey(NodeTypes.ContextNode, u)).exists(_.isUuid))
  }
}
