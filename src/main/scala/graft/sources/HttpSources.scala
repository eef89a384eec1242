package graft.sources

import graft.model._

/** S10/S11 — external REST lookups, kept driver-side behind an interface
  * (SURVEY §7.1.6): CrossRef bibliographic matching
  * (`Sources.fs:249-335`) and GlobalPollenProject taxonomic-backbone
  * resolution (`TaxonomicBackbone.fs:33-107`).
  *
  * These are NOT Spark operators — one driver-side HTTP call per user
  * action in the reference — so the engine models them as pluggable
  * resolvers whose results append to the nodes/edges tables. This
  * environment has zero egress: the [[OfflineBackbone]] stub implements
  * the same contract deterministically for tests; a networked deployment
  * would swap in an HTTP implementation.
  */
object HttpSources {

  final case class SourceMatch(title: String, authors: String, year: Int, doi: String, score: Double)

  /** S10 — CrossRef contract: best match for a free-text citation, with
    * the reference's score-gap acceptance heuristic
    * (`score0 − score1 > 1.0`, `Sources.fs:311-319`).
    */
  trait BibliographicResolver {
    def search(query: String): Seq[SourceMatch]
    final def bestMatch(query: String): Option[SourceMatch] = search(query) match {
      case Seq() => None
      case Seq(one) => Some(one)
      case best +: second +: _ => if (best.score - second.score > 1.0) Some(best) else None
    }
  }

  /** S11 — taxonomic-backbone contract: resolve a name to a taxon node
    * plus its `IsA` ancestor chain (species→genus→family→kingdom→Life).
    */
  trait TaxonomicBackbone {
    def lookup(rank: String, name: Map[String, String]): Option[(NodeRow, Seq[NodeRow], Seq[EdgeRow])]
  }

  /** Deterministic offline stub with a tiny built-in backbone. */
  object OfflineBackbone extends TaxonomicBackbone {
    private val families = Map("Salix" -> "Salicaceae", "Betula" -> "Betulaceae", "Pinus" -> "Pinaceae")

    def lookup(rank: String, name: Map[String, String]): Option[(NodeRow, Seq[NodeRow], Seq[EdgeRow])] = {
      val genus = name.getOrElse("genus", return None)
      families.get(genus).map { family =>
        val lifeKey = Keys.taxonKey("life")
        val familyKey = Keys.taxonKey("family", family)
        val genusKey = Keys.taxonKey("genus", genus)
        val (target, chainStart) = rank match {
          case "species" =>
            val sp = name.getOrElse("species", "")
            val auth = name.getOrElse("authorship", "")
            val key = Keys.taxonKey("species", genus, sp, auth)
            (NodeRow(key, NodeTypes.TaxonNode, s"$genus $sp $auth".trim,
              s"""{"Species":["${Json.str(genus)}","${Json.str(sp)}","${Json.str(auth)}"]}"""), key)
          case _ =>
            (NodeRow(genusKey, NodeTypes.TaxonNode, genus, s"""{"Genus":"${Json.str(genus)}"}"""), genusKey)
        }
        val ancestors = Seq(
          NodeRow(genusKey, NodeTypes.TaxonNode, genus, s"""{"Genus":"${Json.str(genus)}"}"""),
          NodeRow(familyKey, NodeTypes.TaxonNode, family, s"""{"Family":"${Json.str(family)}"}"""),
          NodeRow(lifeKey, NodeTypes.TaxonNode, "Life", """{"Life":{}}"""))
        val chain = (chainStart +: ancestors.map(_.key)).distinct
        val edges = chain.zip(chain.tail).map { case (a, b) => EdgeRow(a, b, 1, "IsA", "{}") }
        (target, ancestors.filterNot(_.key == target.key), edges)
      }
    }
  }

  /** Deterministic offline bibliographic stub. */
  object OfflineCrossRef extends BibliographicResolver {
    def search(query: String): Seq[SourceMatch] = {
      val q = query.toLowerCase
      if (q.contains("example")) Seq(
        SourceMatch("The example title", "Smith, J. A.", 1987, "10.1000/example", 3.2),
        SourceMatch("An unrelated title", "Jones, B.", 1990, "10.1000/other", 1.1))
      else Seq.empty
    }
  }
}
