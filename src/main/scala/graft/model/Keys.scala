package graft.model

import java.util.UUID
import scala.util.Try

/** Deterministic key generation and parsing (reference `Graph.fs:9-28` and
  * `Graph.fs:367-543`).
  *
  * Keys are content-derived strings `"{nodetype}_{id}"`. Determinism matters
  * at scale: deterministic keys make distributed writes idempotent and
  * retry-safe (a re-executed Spark task regenerates the same key). The
  * reference uses fresh GUIDs for six occurrence-like node types
  * (`Graph.fs:439-444,529-532`); we thread those through as explicit,
  * caller-supplied UUID values instead of calling a PRNG inside a task.
  *
  * All functions here are pure, null-safe Scala — usable both driver-side
  * and inside codegen'd expressions / UDFs.
  */
object Keys {

  /** F1 — `safeString` (reference `Graph.fs:367`): strip every character
    * that is not alphanumeric, underscore, space, hyphen or plus.
    */
  def safeString(s: String): String =
    if (s == null) "" else s.replaceAll("[^A-Za-z0-9_ \\-+]", "")

  /** F15 — `takeAlphaNumFirstChars` (reference `Graph.fs:369,212-213`):
    * compact a phrase to the first alphanumeric character of each word,
    * capped at `n` characters. Used for title compaction in source keys.
    */
  def takeAlphaNumFirstChars(s: String, n: Int): String =
    if (s == null) ""
    else
      s.split("\\s+").iterator
        .flatMap(w => w.find(_.isLetterOrDigit))
        .take(n)
        .mkString
        .toLowerCase

  private def norm(s: String): String =
    safeString(s).trim.toLowerCase.replaceAll("[ \\-+]+", "_")

  /** F2 — `makeUniqueKey` (reference `Graph.fs:371-543`), the deterministic
    * content-derived key formats. One constructor per key scheme; the
    * routing by payload type happens in the caller.
    */
  // `<year>ybp` (reference `Graph.fs:527`)
  def calYearKey(yearBP: Int): String = s"${NodeTypes.CalYearNode}_${yearBP}ybp"

  /** Column form of [[calYearKey]] — the ONE place the key format lives
    * for column-side builders (Seed, Time routing).
    */
  def calYearKeyCol(yearBP: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{concat, lit}
    concat(lit(NodeTypes.CalYearNode + "_"), yearBP.cast("string"), lit("ybp"))
  }

  // taxon ranks (reference `Graph.fs:407-423`), e.g.
  // `taxonnode_species_salix_herbacea_l`
  def taxonKey(rank: String, parts: String*): String =
    (NodeTypes.TaxonNode +: norm(rank) +: parts.map(norm)).mkString("_")

  // `pub_<lastname>_<initials-of-title>_<year>` (reference `Graph.fs:445-524`)
  def publicationKey(lastName: String, title: String, year: Int): String =
    s"${NodeTypes.SourceNode}_pub_${norm(lastName)}_${takeAlphaNumFirstChars(title, 40)}_$year"

  // `morphotype_<group>_<name>` (reference `Graph.fs:379-393`)
  def morphotypeKey(group: String, name: String): String =
    s"${NodeTypes.BioticProxyNode}_morphotype_${norm(group)}_${norm(name)}"

  // `<name>_by_<authority>` (reference `Graph.fs:528`)
  def qualitativeLabelKey(name: String, authority: String): String =
    s"${NodeTypes.QualitativeLabelNode}_${norm(name)}_by_${norm(authority)}"

  def outcomeKey(name: String): String =
    s"${NodeTypes.BiodiversityDimensionNode}_${norm(name)}"

  /** GUID-keyed node types (occurrence-scoped reifications): the UUID is an
    * explicit argument so distributed retries are idempotent.
    */
  def uuidKey(nodeType: String, id: UUID): String = s"${nodeType}_$id"

  /** Generic key for demo/derived graphs: `"{nodetype}_{id}"`. */
  def key(nodeType: String, id: Any): String = s"${nodeType}_$id"

  /** F3 — `stringToKey` (reference `Graph.fs:25-28`): split a rendered key
    * back into (nodeType, id) and classify it as a friendly or UUID key.
    */
  final case class ParsedKey(nodeType: String, id: String, isUuid: Boolean)

  // canonical 8-4-4-4-12 form only: java.util.UUID.fromString is lenient
  // (accepts "1-2-3-4-5"), which would misclassify friendly ids as UUIDs
  private val CanonicalUuid =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  def parseKey(key: String): Option[ParsedKey] = {
    if (key == null) return None
    val i = key.indexOf('_')
    if (i <= 0 || i == key.length - 1) None
    else {
      val (t, rest) = (key.substring(0, i), key.substring(i + 1))
      Some(ParsedKey(t, rest, CanonicalUuid.matches(rest)))
    }
  }
}
