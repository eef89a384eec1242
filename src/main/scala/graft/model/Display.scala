package graft.model

/** F5/F8 — display-name formatting (reference `Graph.fs:251-365`, ~115
  * lines of case formatting) and author parsing/formatting
  * (`Types.fs:253-309`). Pure functions; register as UDFs only at the
  * ingest boundary — display names are materialized into the
  * `prettyName` column, never recomputed per query.
  */
object Display {

  /** F8 — parse `"Surname, F. N."` (optionally `"Surname Jr., F."`) into
    * (lastName, initials, suffix) (reference regex `Types.fs:265-280`).
    */
  final case class Author(lastName: String, initials: Seq[String], suffix: Option[String])

  private val authorRx = """^\s*([^,]+?)\s*(Jr\.|Sr\.|III|IV)?\s*,\s*(.+)$""".r

  def parseAuthor(s: String): Option[Author] = s match {
    case authorRx(last, suffix, rest) =>
      val initials = rest.split("[\\s.]+").filter(_.nonEmpty).map(i => s"${i.take(1)}.").toSeq
      Some(Author(last.trim, initials, Option(suffix)))
    case _ => None
  }

  /** `Author.Display` — "Last, I. N." */
  def formatAuthor(a: Author): String =
    s"${a.lastName}${a.suffix.map(" " + _).getOrElse("")}, ${a.initials.mkString(" ")}"

  /** F8 — author list with et-al truncation (reference
    * `Types.fs:304-309`: first n authors + "et al").
    */
  def authorListTruncated(authors: Seq[Author], n: Int = 3): String = {
    val shown = authors.take(n).map(formatAuthor).mkString("; ")
    if (authors.length > n) s"$shown et al." else shown
  }

  /** F5 — display names per node type (the engine-relevant subset of the
    * reference's case formatting; extend per payload family as they are
    * implemented).
    */
  def displayName(nodeType: String, fields: Map[String, String]): String = nodeType match {
    case NodeTypes.CalYearNode =>
      fields.get("year").map(y => s"$y cal yr BP").getOrElse("")
    case NodeTypes.TaxonNode =>
      val rank = fields.getOrElse("rank", "")
      rank match {
        case "species" =>
          val latin = s"${fields.getOrElse("genus", "")} ${fields.getOrElse("species", "")}".trim
          fields.get("authorship").map(a => s"$latin $a").getOrElse(latin)
        case _ => fields.getOrElse("name", "")
      }
    case NodeTypes.QualitativeLabelNode => fields.getOrElse("Name", "")
    case NodeTypes.BioticProxyNode =>
      val name = fields.getOrElse("name", "")
      fields.get("group").filter(_.nonEmpty) match {
        case Some(grp) => s"$name ($grp)".trim
        case None => name // no dangling "()" when the group is absent
      }
    case NodeTypes.SourceNode =>
      val authors = fields.getOrElse("authors", "")
      val year = fields.getOrElse("year", "")
      val title = fields.getOrElse("title", "")
      Seq(authors, if (year.nonEmpty) s"($year)" else "", title)
        .filter(_.nonEmpty).mkString(" ")
    case NodeTypes.ContextNode => fields.getOrElse("Name", "")
    case NodeTypes.BiodiversityDimensionNode => fields.getOrElse("name", "")
    case _ => fields.getOrElse("name", fields.getOrElse("Name", ""))
  }

  /** P5 — the computed latin-name projection used by
    * `tryFindTaxonByName` (reference `Storage.fs:368-388`):
    * `"{genus} {species}"`, `"{genus} {species} var. {variety}"` etc.
    */
  def latinName(rank: String, parts: Map[String, String]): String = rank match {
    case "species" => s"${parts.getOrElse("genus", "")} ${parts.getOrElse("species", "")}".trim
    case "subspecies" =>
      s"${parts.getOrElse("genus", "")} ${parts.getOrElse("species", "")} ssp. ${parts.getOrElse("subspecies", "")}".trim
    case "variety" =>
      s"${parts.getOrElse("genus", "")} ${parts.getOrElse("species", "")} var. ${parts.getOrElse("variety", "")}".trim
    case _ => parts.getOrElse("name", "")
  }
}
