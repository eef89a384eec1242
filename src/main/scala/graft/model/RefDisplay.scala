package graft.model

/** F5 — the reference's FULL `DisplayName()` case list
  * (`Graph.fs:251-365`), reproduced byte-for-byte for all 17 node types.
  *
  * [[Display.displayName]] remains the engine's field-map-driven
  * formatter used at the ingest boundary; this object is the PARITY
  * formatter: given the same payload the reference would render, it
  * produces the identical string, including the quirks:
  *
  *  - `Author.Display` (`Types.fs:297-299`) joins initials with `". "`
  *    and emits NO trailing period (`"Smith, J. A"`), and ignores the
  *    suffix;
  *  - empty author lists render `"Unknown author(s)"`
  *    (`Types.fs:300-302`), and the >n journal-article list appends
  *    `" et al."` after the joined prefix (`Types.fs:304-309`);
  *  - category/measure nodes render via F# structural formatting of the
  *    union case (`n.ToString()`): nullary nested cases print bare
  *    (`"Fossil Mammalia"`), wrapped text prints parenthesized
  *    (`"OtherProxy (ShortText \"Charcoal\")"`);
  *  - the vernacular label case is `failwith "Not Implemented"` in the
  *    reference (`Graph.fs:300`) — mirrored as an exception;
  *  - dark-data details are truncated at 50 CHARS (`Graph.fs:355`),
  *    unlike the key's 40 word-initials.
  */
object RefDisplay {

  // ------------------------------------------------------------- authors

  /** `Author.Display` (`Types.fs:297-299`): initials joined by `". "`,
    * no trailing dot, suffix unused.
    */
  def author(lastName: String, initials: Seq[Char]): String =
    s"$lastName, ${initials.mkString(". ")}"

  /** `Author.authorList` (`Types.fs:300-302`). */
  def authorList(authors: Seq[(String, Seq[Char])]): String =
    if (authors.isEmpty) "Unknown author(s)"
    else authors.map { case (l, i) => author(l, i) }.mkString("; ")

  /** `Author.authorListTruncated` (`Types.fs:304-309`). */
  def authorListTruncated(authors: Seq[(String, Seq[Char])], nDisplay: Int): String =
    if (authors.isEmpty) "Unknown author(s)"
    else if (authors.length > nDisplay)
      authors.take(nDisplay).map { case (l, i) => author(l, i) }.mkString("; ") + " et al."
    else authors.map { case (l, i) => author(l, i) }.mkString("; ")

  // ------------------------------------------- biotic proxies (Graph.fs:255-269)

  def ancientDna(taxon: String): String = s"aDNA: $taxon"

  def contemporaneousWholeOrganism(taxon: String): String =
    s"Contemporaneous Whole Organism: $taxon"

  /** Fossil name first, organ part parenthesized (`Graph.fs:261-262`). */
  def megafossil(part: String, fossilName: String): String =
    s"Megafossil: $fossilName ($part)"

  def macrofossil(part: String, fossilName: String): String =
    s"Macrofossil: $fossilName ($part)"

  private val microfossilGroupDisplay = Map(
    "Diatom" -> "Diatom",
    "Ostracod" -> "Ostracod",
    "PlantMacrofossil" -> "Plant Macrofossil", // display splits the words
    "Pollen" -> "Pollen")

  def microfossil(group: String, name: String): String =
    s"Morphotype: ${microfossilGroupDisplay.getOrElse(group,
      throw new IllegalArgumentException(s"not a named microfossil group: $group"))} - $name"

  def microfossilOther(group: String, name: String): String =
    s"Morphotype: $group - $name"

  /** `BioticProxyCategoryNode.ToString()` (`Graph.fs:270`): F# structural
    * formatting — bare nested nullary case.
    */
  def category(caseName: String, groupCaseName: String): String =
    s"$caseName $groupCaseName"

  def categoryOtherProxy(text: String): String =
    s"""OtherProxy (ShortText "$text")"""

  // ------------------------------------------------- taxonomy (Graph.fs:272-288)

  val taxonLife: String = "Life"

  private val rankBrackets = Map(
    "kingdom" -> "Kingdom", "phylum" -> "Phylum", "class" -> "Class",
    "clade" -> "Clade", "order" -> "Order", "family" -> "Family",
    "subfamily" -> "Sub-Family", "tribe" -> "Tribe", "subtribe" -> "Sub-Tribe",
    "genus" -> "Genus", "subgenus" -> "Sub-Genus")

  def taxonRank(rank: String, name: String): String =
    s"$name [${rankBrackets.getOrElse(rank.toLowerCase,
      throw new IllegalArgumentException(s"not a single-name rank: $rank"))}]"

  def taxonSpecies(genus: String, species: String, authorship: String): String =
    s"$genus $species $authorship [Species]"

  def taxonSubspecies(genus: String, species: String, subspecies: String, authorship: String): String =
    s"$genus $species subsp. $subspecies $authorship [Subspecies]"

  def taxonVariety(genus: String, species: String, variety: String, authorship: String): String =
    s"$genus $species var. $variety $authorship [Variety]"

  /** `TaxonomicNamesIndexNode` shows the raw name (`Graph.fs:271`). */
  def namesIndex(name: String): String = name

  // ---------------------------------------- inference methods (Graph.fs:289-296)

  val inferenceImplicit: String = "Implicit"

  /** Both atlas variants render identically (`Graph.fs:292-293`). */
  def atlas(reference: String): String = s"Explicit: Atlas or Key - $reference"

  def implicitByExpert(lastName: String, initials: String): String =
    s"Implicit: Expert ID - $lastName, $initials"

  def taxonomicNomenclature(name: String): String =
    s"Explicit (nomenclature): from $name"

  def morphotypeTerminology(terminology: String): String =
    s"Explicit (terminology): from $terminology"

  def referenceCollection(name: String, location: String): String =
    s"Explicit: $name (reference collection at $location)"

  // ----------------------------------------- other population (Graph.fs:297-300)

  val proxiedTaxon: String = "[Proxied taxon hyper-edge]"

  /** `ContextNode` leads with the sampling-location CASE NAME
    * (`n.SamplingLocation.GetType().Name`, `Graph.fs:298`) — e.g.
    * `"Site: Lake Vatn"`.
    */
  def context(samplingLocationCase: String, name: String): String =
    s"$samplingLocationCase: $name"

  /** The reference throws for vernacular labels (`Graph.fs:300`) —
    * mirrored so parity tests document the hole rather than invent a
    * format.
    */
  def vernacular(): String =
    throw new NotImplementedError("reference Graph.fs:300: VernacularTaxonLabelNode display is 'failwith'")

  // --------------------------------------------------- datasets (Graph.fs:301-303)

  def digitisedDataset(sourceName: String): String =
    s"Digitised dataset from $sourceName"

  // ---------------------------------------------------- sources (Graph.fs:304-355)

  def bibliographic(author: Option[String], year: Option[Int], title: Option[String]): String =
    s"${author.getOrElse("?")} (${year.map(_.toString).getOrElse("?")}). ${title.getOrElse("?")}"

  def greyLiterature(title: String): String = s"Grey literature source: $title"

  def darkData(contactLastName: String): String = s"'Dark data' from $contactLastName"

  def database(fullName: String): String = s"Database: $fullName"

  def databaseEntry(databaseAbbreviation: String, idInDatabase: String): String =
    s"Database: $databaseAbbreviation - entry $idInDatabase"

  /** Book (`Graph.fs:322-328`): ISBN wins over ISSN/DOI; neither → empty
    * tail after the ". " separator.
    */
  def book(authors: Seq[(String, Seq[Char])], copyrightYear: Int, title: String,
           isbn: Option[String], issnDoi: Option[String]): String = {
    val id = isbn.map(_ + " (ISBN)")
      .orElse(issnDoi.map(_ + " (ISSN/DOI)"))
      .getOrElse("")
    s"${authorList(authors)} ($copyrightYear). [book] $title. $id"
  }

  def bookChapter(authors: Seq[(String, Seq[Char])], chapterTitle: String): String =
    s"${authorList(authors)}. [book chapter] $chapterTitle"

  def dissertation(authorLastName: String, authorInitials: Seq[Char],
                   completionYear: Int, title: String): String =
    s"${author(authorLastName, authorInitials)} ($completionYear). [dissertation] $title"

  def individualDataset(contributors: Seq[(String, Seq[Char])], yearPublished: Option[Int],
                        title: String): String =
    s"${authorList(contributors)} (${yearPublished.map(_.toString).getOrElse("Unknown year")}). [dataset] $title."

  /** Journal article (`Graph.fs:336-342`): the ONE display that truncates
    * the author list (first 5 + " et al.").
    */
  def journalArticle(authors: Seq[(String, Seq[Char])], year: Int,
                     title: String, journal: String): String =
    s"${authorListTruncated(authors, 5)} ($year). $title. $journal"

  def greyLiteratureSource(contributors: Seq[(String, Seq[Char])], postedYear: Option[Int],
                           format: String, title: String, institution: Option[String]): String =
    s"${authorList(contributors)} (${postedYear.map(_.toString).getOrElse("Unknown year")}). " +
      s"[grey|$format] $title${institution.map(". " + _).getOrElse("")}"

  /** Dark-data source (`Graph.fs:349-355`): details capped at 50 chars. */
  def darkDataSource(investigators: Seq[(String, Seq[Char])], title: Option[String],
                     details: String): String =
    s"${authorList(investigators)} unpublished. [dataset] " +
      s"${title.map(_ + ". ").getOrElse("")}${details.take(50)}"

  // --------------------------------------------------- exposure (Graph.fs:356-362)

  def year(yearBP: Int): String = s"$yearBP cal yr BP"

  def sliceLabel(name: String, designatingAuthority: String): String =
    s"$name (designated by: $designatingAuthority)"

  val timeline: String = "A study timeline"

  val individualDate: String = "An individual date"

  def outOfScopeLabel(name: String, designatingAuthority: String): String =
    s"$name (designated by: $designatingAuthority)"

  val dateCalibration: String = "Recalibration of one to many radiocarbon dates"

  // ---------------------------------------------------- outcomes (Graph.fs:363-365)

  /** `MeasureNode.ToString()` — bare case name for the six nullary
    * measures, structural form for the custom case.
    */
  private val measureCases = Set(
    "Abundance", "DiversityBeta", "Evenness", "PresenceOnly", "PresenceAbsence", "Richness")

  def measure(caseName: String): String =
    if (measureCases(caseName)) caseName
    else throw new IllegalArgumentException(s"not a named measure: $caseName")

  def customMeasure(text: String): String =
    s"""OtherBiodiversityDimension (ShortText "$text")"""
}
