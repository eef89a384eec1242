package graft.model

import org.scalatest.funsuite.AnyFunSuite

class DisplaySpec extends AnyFunSuite {

  test("F8 author parse round-trips the reference format (ref Types.fs:265-309)") {
    val a = Display.parseAuthor("Smith, J. A.").get
    assert(a.lastName == "Smith" && a.initials == Seq("J.", "A."))
    assert(Display.formatAuthor(a) == "Smith, J. A.")
    val jr = Display.parseAuthor("Smith Jr., John Albert").get
    assert(jr.suffix.contains("Jr.") && Display.formatAuthor(jr) == "Smith Jr., J. A.")
    assert(Display.parseAuthor("NoComma").isEmpty)
  }

  test("F8 author list truncation appends et al. after n authors") {
    val authors = Seq("A, B.", "C, D.", "E, F.", "G, H.").flatMap(Display.parseAuthor)
    assert(Display.authorListTruncated(authors, 2) == "A, B.; C, D. et al.")
    assert(Display.authorListTruncated(authors.take(2), 2) == "A, B.; C, D.")
  }

  test("F5 display names per node type (ref Graph.fs:251-365)") {
    assert(Display.displayName(NodeTypes.CalYearNode, Map("year" -> "11650")) == "11650 cal yr BP")
    assert(Display.displayName(NodeTypes.TaxonNode,
      Map("rank" -> "species", "genus" -> "Salix", "species" -> "herbacea", "authorship" -> "L.")) ==
      "Salix herbacea L.")
    assert(Display.displayName(NodeTypes.SourceNode,
      Map("authors" -> "Smith, J. A.", "year" -> "1987", "title" -> "The example title")) ==
      "Smith, J. A. (1987) The example title")
  }

  test("P5 latin-name projection incl. variety form (ref Storage.fs:368-388)") {
    assert(Display.latinName("species", Map("genus" -> "Salix", "species" -> "herbacea")) ==
      "Salix herbacea")
    assert(Display.latinName("variety",
      Map("genus" -> "Betula", "species" -> "nana", "variety" -> "exilis")) ==
      "Betula nana var. exilis")
  }
}
