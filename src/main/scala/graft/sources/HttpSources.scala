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

  /** Shared chain assembly: species/genus target plus the IsA ancestor
    * chain species → genus → family → kingdom Plantae → Life (the
    * reference interposes `Kingdom Plantae` between family and Life —
    * `TaxonomicBackbone.fs:58-60,80-105`).
    */
  private[sources] def taxonChain(rank: String, genus: String, family: String,
                                  species: String, authorship: String)
      : (NodeRow, Seq[NodeRow], Seq[EdgeRow]) = {
    val lifeKey = Keys.taxonKey("life")
    val kingdomKey = Keys.taxonKey("kingdom", "Plantae")
    val familyKey = Keys.taxonKey("family", family)
    val genusKey = Keys.taxonKey("genus", genus)
    val genusNode =
      NodeRow(genusKey, NodeTypes.TaxonNode, genus, s"""{"Genus":"${Json.str(genus)}"}""")
    val (target, chainStart) = rank match {
      case "species" =>
        val key = Keys.taxonKey("species", genus, species, authorship)
        (NodeRow(key, NodeTypes.TaxonNode, s"$genus $species $authorship".trim,
          s"""{"Species":["${Json.str(genus)}","${Json.str(species)}","${Json.str(authorship)}"]}"""), key)
      case "family" =>
        (NodeRow(familyKey, NodeTypes.TaxonNode, family,
          s"""{"Family":"${Json.str(family)}"}"""), familyKey)
      case _ =>
        (genusNode, genusKey)
    }
    // a family lookup has no genus level: its chain starts at the family
    val ancestors = (if (rank == "family") Nil else Seq(genusNode)) ++ Seq(
      NodeRow(familyKey, NodeTypes.TaxonNode, family, s"""{"Family":"${Json.str(family)}"}"""),
      NodeRow(kingdomKey, NodeTypes.TaxonNode, "Plantae", s"""{"Kingdom":"Plantae"}"""),
      NodeRow(lifeKey, NodeTypes.TaxonNode, "Life", """{"Life":{}}"""))
    val chain = (chainStart +: ancestors.map(_.key)).distinct
    val edges = chain.zip(chain.tail).map { case (a, b) => EdgeRow(a, b, 1, "IsA", "{}") }
    (target, ancestors.filterNot(_.key == target.key), edges)
  }

  /** Deterministic offline stub with a tiny built-in backbone. */
  object OfflineBackbone extends TaxonomicBackbone {
    private val families = Map("Salix" -> "Salicaceae", "Betula" -> "Betulaceae", "Pinus" -> "Pinaceae")

    def lookup(rank: String, name: Map[String, String]): Option[(NodeRow, Seq[NodeRow], Seq[EdgeRow])] =
      if (rank == "family")
        name.get("family").filter(families.values.toSet)
          .map(family => taxonChain(rank, "", family, "", ""))
      else for {
        genus <- name.get("genus")
        family <- families.get(genus)
      } yield taxonChain(rank, genus, family,
        name.getOrElse("species", ""), name.getOrElse("authorship", ""))
  }

  /** S11 live implementation — GlobalPollenProject's backbone/trace API,
    * matching the reference's query construction and accepted-status
    * selection (`TaxonomicBackbone.fs:33-107`: `rank=Species&family=…&
    * genus=…&species=…&latinname=G S&authorship=…`; a unique result with
    * `TaxonomicStatus == "accepted"`, else the first accepted one). JDK
    * HttpClient + Jackson (both already on the classpath) — no new
    * dependencies. Exercised by LiveHttpSpec when GRAFT_LIVE_HTTP is set
    * (this build environment has zero egress, so it is skipped here).
    */
  final class HttpBackbone(
      base: String = "https://globalpollenproject.org/api/v1/backbone",
      timeoutSec: Long = 30) extends TaxonomicBackbone {
    def lookup(rank: String, name: Map[String, String]): Option[(NodeRow, Seq[NodeRow], Seq[EdgeRow])] = {
      val genus = name.getOrElse("genus", "")
      val species = name.getOrElse("species", "")
      val authorship = name.getOrElse("authorship", "")
      val family = name.getOrElse("family", "")
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      // each rank requires its own name part — genus is NOT required for
      // a family lookup (the reference queries family by latin name alone)
      val query = rank match {
        case "family" if family.nonEmpty =>
          s"rank=Family&family=${enc(family)}&latinname=${enc(family)}"
        case "genus" if genus.nonEmpty =>
          s"rank=Genus&family=${enc(family)}&genus=${enc(genus)}&latinname=${enc(genus)}"
        case "species" if genus.nonEmpty && species.nonEmpty =>
          s"rank=Species&family=${enc(family)}&genus=${enc(genus)}" +
          s"&species=${enc(species)}&latinname=${enc(s"$genus $species")}&authorship=${enc(authorship)}"
        case _ => return None
      }
      val body = Http.getString(s"$base/trace?$query", timeoutSec)
      val arr = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      if (!arr.isArray || arr.size == 0) return None
      val accepted = (0 until arr.size).map(arr.get)
        .find(_.path("taxonomicStatus").asText("") == "accepted")
        .orElse((0 until arr.size).map(arr.get)
          .find(_.path("TaxonomicStatus").asText("") == "accepted"))
      accepted.map { vm =>
        def f(lower: String, pascal: String) = {
          val v = vm.path(lower).asText("")
          if (v.nonEmpty) v else vm.path(pascal).asText("")
        }
        val gen = Option(f("genus", "Genus")).filter(_.nonEmpty).getOrElse(genus)
        val fam = Option(f("family", "Family")).filter(_.nonEmpty).getOrElse(family)
        val auth = Option(f("namedBy", "NamedBy")).filter(_.nonEmpty).getOrElse(authorship)
        taxonChain(rank, gen, fam, species, auth)
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

  /** S10 live implementation — the CrossRef works API with the
    * reference's query shape (`Sources.fs:258-260`:
    * `works?query.bibliographic=…&rows=2`); [[BibliographicResolver
    * .bestMatch]] then applies the same score-gap acceptance the
    * reference uses (`Sources.fs:311-319`). Exercised by LiveHttpSpec
    * when GRAFT_LIVE_HTTP is set.
    */
  final class HttpCrossRef(
      base: String = "https://api.crossref.org/works",
      timeoutSec: Long = 30) extends BibliographicResolver {
    def search(query: String): Seq[SourceMatch] = {
      val url = s"$base?query.bibliographic=${java.net.URLEncoder.encode(query, "UTF-8")}&rows=2"
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Http.getString(url, timeoutSec))
      if (root.path("status").asText("") != "ok") return Seq.empty
      val items = root.path("message").path("items")
      (0 until items.size).map(items.get).map { m =>
        val title = if (m.path("title").size > 0) m.path("title").get(0).asText("") else ""
        val authors = {
          val a = m.path("author")
          (0 until a.size).map(a.get).map { x =>
            Seq(x.path("family").asText(""), x.path("given").asText(""))
              .filter(_.nonEmpty).mkString(", ")
          }.filter(_.nonEmpty).mkString("; ")
        }
        val year = {
          val dp = m.path("published").path("date-parts")
          if (dp.size > 0 && dp.get(0).size > 0) dp.get(0).get(0).asInt(0) else 0
        }
        SourceMatch(title, authors, year, m.path("DOI").asText(""), m.path("score").asDouble(0.0))
      }
    }
  }

  /** Minimal blocking GET over the JDK HttpClient (Java 17). One shared
    * client (documented thread-safe) — a per-call client would allocate
    * a fresh connection pool and executor per GET and never reuse
    * connections to the same host across a backbone sync.
    */
  private[sources] object Http {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

    def getString(url: String, timeoutSec: Long): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSec))
        .header("User-Agent", "graft-engine/0.1 (Spark analytics library)")
        .GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
      resp.body()
    }
  }
}
