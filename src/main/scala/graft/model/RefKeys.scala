package graft.model

/** F2 — the reference's FULL `makeUniqueKey` case list (`Graph.fs:371-543`),
  * reproduced byte-for-byte.
  *
  * [[Keys]] is the engine's own scheme (normalized: spaces → `_`), used by
  * the seeded/oracled graph because path-safe, shell-safe keys are the right
  * call for a distributed store. This object is the PARITY scheme: given the
  * same payload the reference would key, it renders the identical string —
  * including the reference's quirks, which are mirrored deliberately:
  *
  *  - `safeString` (`Graph.fs:367`) HTML-encodes first (so `&` → `amp`
  *    after stripping, `é` → `233`) and its character class `[^aA-zZ_ \-+0-9]`
  *    uses the `A-z` ASCII span, which also admits `[ \ ] ^ _ `` `;
  *  - spaces survive into keys (nothing replaces them);
  *  - `toLower` applies to the WHOLE rendered key, last;
  *  - three different "initials" folds exist: alphanumeric-head-only
  *    (`tryAlphanum`, `Graph.fs:369`), any-head-char (grey literature,
  *    `Graph.fs:459-463`), and alphanumeric-head capped at 40 (dark data);
  *  - subspecies/variety authorships are HTML-encoded but NOT safe-stripped
  *    (`Graph.fs:421-422`);
  *  - empty author lists render empty segments (double underscores), and
  *    absent fields render the literal `unknown`/`notitle`/`noyear`/`unk`/
  *    `single` markers.
  *
  * GUID-keyed types (`ProxiedTaxonNode`, `ContextNode`, timeline/date/
  * calibration/digitised nodes — `Graph.fs:439-444,529-532`) go through
  * [[Keys.uuidKey]] with an explicit UUID.
  */
object RefKeys {

  // ---------------------------------------------------------- primitives

  /** .NET `WebUtility.HtmlEncode`: `< > & " '` become entities; chars in
    * U+00A0..U+00FF become numeric entities; BMP chars U+0100+ pass
    * through; valid surrogate PAIRS become decimal numeric entities of
    * the full code point (so an emoji leaves its code-point digits in a
    * safe-stripped key, same as the documented `é` → `233` case); lone
    * surrogates become U+FFFD, as .NET writes.
    */
  private[model] def htmlEncode(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '<'                      => b.append("&lt;")
        case '>'                      => b.append("&gt;")
        case '&'                      => b.append("&amp;")
        case '"'                      => b.append("&quot;")
        case '\''                     => b.append("&#39;")
        case c if c >= 160 && c < 256 => b.append("&#").append(c.toInt).append(';')
        case c if Character.isHighSurrogate(c) =>
          if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) {
            b.append("&#").append(Character.toCodePoint(c, s.charAt(i + 1))).append(';')
            i += 1
          } else b.append('�')
        case c if Character.isLowSurrogate(c) => b.append('�')
        case c                        => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** Reference `safeString` (`Graph.fs:367`) — HtmlEncode then strip by the
    * reference's own character class, `A-z` span and all.
    */
  def safeString(s: String): String =
    if (s == null) "" else htmlEncode(s).replaceAll("[^aA-zZ_ \\-+0-9]", "")

  /** The reference's `tryAlphanum` predicate is .NET
    * `Char.IsLetter || Char.IsNumber` (`Graph.fs:212`); `IsNumber` also
    * accepts the Nl/No categories (`½`, `Ⅻ`, circled digits), unlike
    * Java's `isLetterOrDigit` which stops at Nd.
    */
  private[model] def isRefAlphanum(c: Char): Boolean =
    Character.isLetter(c) || {
      val t = Character.getType(c)
      t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
    }

  /** `tryAlphanum` word-initials (`Graph.fs:369,455-458`): head char of
    * each space-separated word, kept only when alphanumeric. (The
    * reference throws on empty words; empty words are skipped here.)
    */
  private[model] def initials(s: String): String =
    if (s == null) ""
    else s.split(" ", -1).iterator
      .filter(_.nonEmpty)
      .map(_.head)
      .filter(isRefAlphanum)
      .mkString

  /** Any-head-char word initials — the grey-literature fold
    * (`Graph.fs:459-463` uses `Seq.head >> string` without `tryAlphanum`).
    */
  private[model] def headChars(s: String): String =
    if (s == null) ""
    else s.split(" ", -1).iterator.filter(_.nonEmpty).map(_.head).mkString

  /** Head alphanumeric char of each NAME in a list — the additional-author
    * fold (`takeAlphaNumFirstChars` over a name seq, `Graph.fs:369,475`).
    */
  private def nameInitials(names: Seq[String]): String =
    names.iterator
      .flatMap(n => Option(n).flatMap(_.headOption))
      .filter(isRefAlphanum)
      .mkString

  private def friendly(nodeType: String, text: String): String =
    s"${nodeType}_$text".toLowerCase

  // ------------------------------------------- BioticProxyNode (Graph.fs:380-391)

  def ancientDna(taxon: String): String =
    friendly(NodeTypes.BioticProxyNode, s"aDNA_${safeString(taxon)}")

  def contemporaneousWholeOrganism(taxon: String): String =
    friendly(NodeTypes.BioticProxyNode, s"direct_${safeString(taxon)}")

  /** Mega/macrofossil morphotypes: fossil name FIRST, organ part second
    * (`Graph.fs:384-385` — the sprintf order flips the tuple).
    */
  def megafossil(part: String, fossilName: String): String =
    friendly(NodeTypes.BioticProxyNode,
      s"morphotype_megafossil_${safeString(fossilName)}_${safeString(part)}")

  def macrofossil(part: String, fossilName: String): String =
    friendly(NodeTypes.BioticProxyNode,
      s"morphotype_macrofossil_${safeString(fossilName)}_${safeString(part)}")

  /** The four named microfossil groups (`Graph.fs:386-390`). */
  def microfossil(group: String, name: String): String = {
    require(Set("Diatom", "Ostracod", "PlantMacrofossil", "Pollen")(group),
      s"not a named microfossil group: $group")
    friendly(NodeTypes.BioticProxyNode,
      s"morphotype_${group.toLowerCase}_${safeString(name)}")
  }

  def microfossilOther(group: String, name: String): String =
    friendly(NodeTypes.BioticProxyNode,
      s"morphotype_customgroup_${safeString(group)}_${safeString(name)}")

  // ----------------------------------- BioticProxyCategoryNode (Graph.fs:392-406)

  def categoryAncientDna(taxonGroup: String): String =
    friendly(NodeTypes.BioticProxyCategoryNode, s"aDNA_${safeString(taxonGroup)}")

  def categoryContemporary(taxonGroup: String): String =
    friendly(NodeTypes.BioticProxyCategoryNode, s"contemporary_${safeString(taxonGroup)}")

  def categoryFossil(taxonGroup: String): String =
    friendly(NodeTypes.BioticProxyCategoryNode, s"fossil_${safeString(taxonGroup)}")

  /** `OtherProxy` shares the `fossil_` prefix (`Graph.fs:398`). */
  def categoryOtherProxy(proxy: String): String =
    friendly(NodeTypes.BioticProxyCategoryNode, s"fossil_${safeString(proxy)}")

  def categoryMicrofossil(group: String): String = {
    require(Set("Diatom", "Ostracod", "PlantMacrofossil", "Pollen")(group),
      s"not a named microfossil group: $group")
    friendly(NodeTypes.BioticProxyCategoryNode, s"fossilmicro_${group.toLowerCase}")
  }

  def categoryMicrofossilOther(group: String): String =
    friendly(NodeTypes.BioticProxyCategoryNode, s"fossilmicro_other_${safeString(group)}")

  // --------------------------------------------- TaxonomyNode (Graph.fs:408-422)

  val taxonLife: String = friendly(NodeTypes.TaxonNode, "life")

  /** The eleven single-name ranks (`Graph.fs:410-419`). */
  private val singleNameRanks = Set(
    "kingdom", "phylum", "class", "clade", "order", "family",
    "subfamily", "tribe", "subtribe", "genus", "subgenus")

  def taxonRank(rank: String, name: String): String = {
    require(singleNameRanks(rank.toLowerCase), s"not a single-name rank: $rank")
    friendly(NodeTypes.TaxonNode, s"${rank.toLowerCase}_${safeString(name)}")
  }

  def taxonSpecies(genus: String, species: String, authorship: String): String =
    friendly(NodeTypes.TaxonNode,
      s"species_${safeString(genus)}_${safeString(species)}_${safeString(authorship)}")

  /** Subspecies/variety authorship is HTML-encoded but NOT safe-stripped
    * (`Graph.fs:421-422`).
    */
  def taxonSubspecies(genus: String, species: String, subspecies: String, authorship: String): String =
    friendly(NodeTypes.TaxonNode,
      s"subspecies_${safeString(genus)}_${safeString(species)}_${safeString(subspecies)}_${htmlEncode(authorship)}")

  def taxonVariety(genus: String, species: String, variety: String, authorship: String): String =
    friendly(NodeTypes.TaxonNode,
      s"variety_${safeString(genus)}_${safeString(species)}_${safeString(variety)}_${htmlEncode(authorship)}")

  // --------------------------------- TaxonomicNamesIndexNode (Graph.fs:424-425)

  def namesIndex(name: String): String =
    friendly(NodeTypes.TaxonomicNamesIndexNode, s"nomenclature-index_${safeString(name)}")

  // ------------------------------------- InferenceMethodNode (Graph.fs:426-438)

  val inferenceImplicit: String = friendly(NodeTypes.InferenceMethodNode, "Implicit")

  def atlas(reference: String): String =
    friendly(NodeTypes.InferenceMethodNode, s"atlas_${safeString(initials(reference))}")

  def atlasWithLookup(reference: String): String =
    friendly(NodeTypes.InferenceMethodNode, s"atlas_lookup_${safeString(initials(reference))}")

  def implicitByExpert(lastName: String, expertInitials: String): String =
    friendly(NodeTypes.InferenceMethodNode,
      s"expert_${safeString(lastName)}_${safeString(expertInitials)}")

  def taxonomicNomenclature(name: String): String =
    friendly(NodeTypes.InferenceMethodNode, s"nomenclature_${safeString(initials(name))}")

  def morphotypeTerminology(terminology: String): String =
    friendly(NodeTypes.InferenceMethodNode,
      s"morphotypeterminology_${safeString(initials(terminology))}")

  def referenceCollection(name: String, location: String): String =
    friendly(NodeTypes.InferenceMethodNode,
      s"referencecollection_${safeString(initials(name))}_${safeString(initials(location))}")

  // --------------------------------- VernacularTaxonLabelNode (Graph.fs:441)

  def vernacular(language: String, label: String): String =
    friendly(NodeTypes.VernacularTaxonLabelNode,
      s"${safeString(language)}_${safeString(label)}")

  // ---------------------------------------------- SourceNode (Graph.fs:445-524)

  /** Legacy bibliographic record (`Graph.fs:451-458`): author surname is
    * the RAW text before the first comma (no safe-strip), title collapses
    * to word initials, absent fields render their literal markers.
    */
  def bibliographic(author: Option[String], title: Option[String], year: Option[Int]): String =
    friendly(NodeTypes.SourceNode, Seq(
      "pub",
      author.map(_.split(",", -1)(0)).getOrElse("unknown"),
      title.map(initials).getOrElse("notitle"),
      year.map(_.toString).getOrElse("noyear")).mkString("_"))

  /** Legacy grey literature (`Graph.fs:459-463`): head chars keep
    * punctuation (no `tryAlphanum` in this fold).
    */
  def greyLiterature(lastName: String, firstName: String, title: String): String =
    friendly(NodeTypes.SourceNode,
      s"grey_${lastName}_${headChars(firstName)}_${headChars(title)}")

  /** Legacy dark data (`Graph.fs:464`): detail initials capped at 40. */
  def darkData(lastName: String, firstName: String, details: String): String =
    friendly(NodeTypes.SourceNode,
      s"darkdata_${safeString(lastName)}_${safeString(firstName)}_${initials(details).take(40)}")

  def database(abbreviation: String): String =
    friendly(NodeTypes.SourceNode, s"database_${safeString(abbreviation)}")

  def databaseEntry(databaseAbbreviation: String, idInDatabase: String): String =
    friendly(NodeTypes.SourceNode,
      s"database_${safeString(databaseAbbreviation)}_entry_${safeString(idInDatabase)}")

  /** `PublishedSource.Book` (`Graph.fs:469-476`): no additional authors →
    * empty segment (double underscore), exactly like the reference.
    */
  def book(firstAuthorLastName: String, additionalAuthorLastNames: Seq[String],
           title: String, copyrightYear: Int): String =
    friendly(NodeTypes.SourceNode, Seq(
      "book", firstAuthorLastName,
      nameInitials(additionalAuthorLastNames),
      initials(title), copyrightYear.toString).mkString("_"))

  def bookChapter(chapterFirstAuthorLastName: String, additionalAuthorLastNames: Seq[String],
                  chapterTitle: String, firstPage: Int): String =
    friendly(NodeTypes.SourceNode, Seq(
      "book-chapter", chapterFirstAuthorLastName,
      nameInitials(additionalAuthorLastNames),
      initials(chapterTitle), firstPage.toString).mkString("_"))

  /** Contributor = (last name, concatenated initials), e.g.
    * `("Hughes", "AC")`.
    */
  def individualDataset(contributors: Seq[(String, String)], yearPublished: Option[Int],
                        title: String): String =
    friendly(NodeTypes.SourceNode, Seq(
      "published-dataset",
      contributors.headOption.map(_._1).getOrElse("unk"),
      contributors.headOption.map(_._2).getOrElse("unk"),
      if (contributors.length > 1) nameInitials(contributors.tail.map(_._1)) else "single",
      yearPublished.map(_.toString).getOrElse("unk"),
      initials(title)).mkString("_"))

  def dissertation(authorLastName: String, authorInitials: String,
                   completionYear: Int, title: String): String =
    friendly(NodeTypes.SourceNode, Seq(
      "dissertation", authorLastName, authorInitials,
      completionYear.toString, initials(title)).mkString("_"))

  def journalArticle(firstAuthorLastName: String, title: String, year: Int): String =
    friendly(NodeTypes.SourceNode, Seq(
      "pub", firstAuthorLastName, initials(title), year.toString).mkString("_"))

  /** `GreyLiteratureSource` (`Graph.fs:508-515`): the format tag is
    * lowercased BEFORE safe-stripping (unique among the cases).
    */
  def greyLiteratureSource(format: String, contributors: Seq[(String, String)],
                           postedYear: Option[Int], title: String): String =
    friendly(NodeTypes.SourceNode, Seq(
      "greylit",
      safeString(format.toLowerCase),
      contributors.headOption.map(_._1).getOrElse("unk"),
      contributors.headOption.map(_._2).getOrElse("unk"),
      if (contributors.length > 1) nameInitials(contributors.tail.map(_._1)) else "single",
      postedYear.map(_.toString).getOrElse("unk"),
      initials(title)).mkString("_"))

  def darkDataSource(investigatorLastName: String, investigatorInitials: String,
                     additionalInvestigatorLastNames: Seq[String],
                     compilationYear: Option[Int], details: String): String =
    friendly(NodeTypes.SourceNode, Seq(
      "darkdata", investigatorLastName, investigatorInitials,
      nameInitials(additionalInvestigatorLastNames),
      compilationYear.map(_.toString).getOrElse("unk"),
      initials(details)).mkString("_"))

  // -------------------------------------------- ExposureNode (Graph.fs:525-532)

  def year(yearBP: Int): String =
    friendly(NodeTypes.CalYearNode, s"${yearBP}ybp")

  def sliceLabel(name: String, designatingAuthority: String): String =
    friendly(NodeTypes.QualitativeLabelNode,
      s"${safeString(name)}_by_${safeString(designatingAuthority)}")

  def outOfScopeLabel(name: String, designatingAuthority: String): String =
    friendly(NodeTypes.QualitativeLabelOutOfScopeNode,
      s"${safeString(name)}_by_${safeString(designatingAuthority)}")

  // --------------------------------------------- OutcomeNode (Graph.fs:533-543)

  private val measures = Map(
    "Abundance" -> "abundance",
    "DiversityBeta" -> "beta_diversity",
    "Evenness" -> "evenness",
    "PresenceOnly" -> "presence",
    "PresenceAbsence" -> "presence_absence",
    "Richness" -> "richness")

  def measure(caseName: String): String =
    friendly(NodeTypes.BiodiversityDimensionNode,
      measures.getOrElse(caseName,
        throw new IllegalArgumentException(s"not a named measure: $caseName")))

  def customMeasure(name: String): String =
    friendly(NodeTypes.BiodiversityDimensionNode, s"custom_${safeString(name)}")
}
