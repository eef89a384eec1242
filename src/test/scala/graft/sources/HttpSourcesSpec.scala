package graft.sources

import graft.SparkSpec
import graft.core.Seed
import graft.model.Keys

class HttpSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S10 score-gap heuristic accepts only clear winners (ref Sources.fs:311-319)") {
    assert(HttpSources.OfflineCrossRef.bestMatch("the example title")
      .exists(_.doi == "10.1000/example")) // gap 3.2-1.1 > 1.0
    assert(HttpSources.OfflineCrossRef.bestMatch("zzz").isEmpty)
    val tight = new HttpSources.BibliographicResolver {
      def search(q: String) = Seq(
        HttpSources.SourceMatch("a", "x", 2000, "10.1/a", 2.0),
        HttpSources.SourceMatch("b", "y", 2001, "10.1/b", 1.5))
    }
    assert(tight.bestMatch("q").isEmpty) // gap 0.5 ≤ 1.0 → ambiguous
  }

  test("S11 backbone lookup emits the IsA ancestor chain and commits to a seeded graph") {
    val Some((taxon, ancestors, edges)) = HttpSources.OfflineBackbone.lookup(
      "species", Map("genus" -> "Salix", "species" -> "herbacea", "authorship" -> "L."))
    assert(taxon.key == "taxonnode_species_salix_herbacea_l")
    assert(edges.map(_.relType).distinct == Seq("IsA"))
    assert(edges.last.dst == Keys.taxonKey("life"))
    // chain: species → genus → family → kingdom Plantae → Life
    // (ref TaxonomicBackbone.fs:58-60,80-105 interposes Kingdom Plantae)
    assert(edges.map(_.dst).containsSlice(
      Seq(Keys.taxonKey("genus", "Salix"), Keys.taxonKey("family", "Salicaceae"),
        Keys.taxonKey("kingdom", "Plantae"), Keys.taxonKey("life"))))

    val g = Seed.seedGraph(spark).addNodesOrSkip((taxon +: ancestors).toDS())
    val g2 = g.addRelations(edges.toDS())
    assert(g2.isRight, g2.left.toOption.mkString)
  }

  test("S11 unknown genus resolves to None") {
    assert(HttpSources.OfflineBackbone.lookup("genus", Map("genus" -> "Nonexistus")).isEmpty)
  }

  test("S11 family-rank lookup targets the family node, no genus level") {
    val Some((taxon, ancestors, edges)) = HttpSources.OfflineBackbone.lookup(
      "family", Map("family" -> "Salicaceae")) // no genus supplied
    assert(taxon.key == Keys.taxonKey("family", "Salicaceae"))
    assert(taxon.payload == """{"Family":"Salicaceae"}""")
    // chain: family → kingdom Plantae → Life — no genus node anywhere
    assert(ancestors.map(_.key) ==
      Seq(Keys.taxonKey("kingdom", "Plantae"), Keys.taxonKey("life")))
    assert(edges.map(e => (e.src, e.dst)) == Seq(
      Keys.taxonKey("family", "Salicaceae") -> Keys.taxonKey("kingdom", "Plantae"),
      Keys.taxonKey("kingdom", "Plantae") -> Keys.taxonKey("life")))
    assert(HttpSources.OfflineBackbone.lookup("family", Map("family" -> "Nonexistaceae")).isEmpty)
  }
}
