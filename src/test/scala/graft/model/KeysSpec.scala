package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class KeysSpec extends AnyFunSuite {

  test("safeString strips disallowed characters (F1, ref Graph.fs:367)") {
    assert(Keys.safeString("Salix. herbacea, (L.)!") == "Salix herbacea L")
    assert(Keys.safeString(null) == "")
    assert(Keys.safeString("a_b-c+d 9") == "a_b-c+d 9")
  }

  test("takeAlphaNumFirstChars compacts titles (F15, ref Graph.fs:369)") {
    assert(Keys.takeAlphaNumFirstChars("The Example Title", 40) == "tet")
    assert(Keys.takeAlphaNumFirstChars("The Example Title", 2) == "te")
    assert(Keys.takeAlphaNumFirstChars("", 5) == "")
  }

  test("key formats match the reference schemes (F2, ref Graph.fs:373-543)") {
    assert(Keys.calYearKey(11650) == "calyearnode_11650ybp")
    assert(Keys.calYearKey(-72) == "calyearnode_-72ybp")
    assert(Keys.taxonKey("species", "Salix", "herbacea", "L.") ==
      "taxonnode_species_salix_herbacea_l")
    assert(Keys.morphotypeKey("pollen", "Salix-type") ==
      "bioticproxynode_morphotype_pollen_salix_type")
    assert(Keys.publicationKey("Smith", "The example title", 1987) ==
      "sourcenode_pub_smith_tet_1987")
    assert(Keys.qualitativeLabelKey("Holocene", "Global Stratotype Section and Point") ==
      "qualitativelabelnode_holocene_by_global_stratotype_section_and_point")
  }

  test("parseKey round-trips rendered keys (F3, ref Graph.fs:25-28)") {
    val parsed = Keys.parseKey("calyearnode_11650ybp")
    assert(parsed.contains(Keys.ParsedKey("calyearnode", "11650ybp", isUuid = false)))
    val u = java.util.UUID.randomUUID()
    val pk = Keys.parseKey(Keys.uuidKey(NodeTypes.ContextNode, u))
    assert(pk.exists(p => p.isUuid && p.id == u.toString))
    assert(Keys.parseKey("nounderscore").isEmpty)
    assert(Keys.parseKey("").isEmpty)
  }

  test("property: parseKey inverts key construction for friendly ids") {
    val idGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val gen = for { t <- Gen.oneOf(NodeTypes.all); id <- idGen } yield (t, id)
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(200).foreach { s =>
      gen.apply(Gen.Parameters.default, s).foreach { case (t, id) =>
        val p = Keys.parseKey(Keys.key(t, id))
        assert(p.exists(x => x.nodeType == t && x.id == id), s"key ${Keys.key(t, id)}")
      }
    }
  }
}
