package graft.operators

import graft.SparkSpec
import graft.core.GraphState
import graft.model.{EdgeRow, NodeRow}
import org.apache.spark.sql.functions._

class MotifSpec extends SparkSpec {
  import spark.implicits._

  /** a→b→c chain, a→c shortcut, d isolated, self-loop on e. */
  private def fixture: GraphState = {
    val nodes = Seq("a", "b", "c", "d", "e").map(k =>
      NodeRow(s"t_$k", "t", k.toUpperCase, "{}")).toDS()
    val edges = Seq(
      EdgeRow("t_a", "t_b", 1, "Next", "{}"),
      EdgeRow("t_b", "t_c", 1, "Next", "{}"),
      EdgeRow("t_a", "t_c", 1, "Shortcut", "{}"),
      EdgeRow("t_e", "t_e", 1, "Self", "{}")
    ).toDS()
    GraphState(nodes, edges)
  }

  test("two-term chain join binds the shared vertex") {
    val m = Motif.find(fixture, "(x)-[:Next]->(y); (y)-[:Next]->(z)")
      .select(col("x.key"), col("y.key"), col("z.key")).collect()
    assert(m.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("t_a", "t_b", "t_c")))
  }

  test("edge name captures edge attributes; untyped term matches any relType") {
    val m = Motif.find(fixture, "(x)-[e]->(y)")
      .select(col("e.relType")).collect().map(_.getString(0)).sorted
    assert(m.toSeq == Seq("Next", "Next", "Self", "Shortcut"))
  }

  test("negated term excludes matches (chain pairs without a shortcut)") {
    val m = Motif.find(fixture, "(x)-[:Next]->(y); !(x)-[:Shortcut]->(y)")
      .select(col("x.key"), col("y.key")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // a→b (no shortcut a→b) and b→c (no shortcut b→c) both survive;
    // nothing else matches Next
    assert(m == Set(("t_a", "t_b"), ("t_b", "t_c")))
  }

  test("negation with an existential variable: vertices with no in-edge of a type") {
    // x such that NOTHING points to x via Next
    val m = Motif.find(fixture, "(x)-[:Next]->(y); !(w)-[:Next]->(x)")
      .select(col("x.key")).collect().map(_.getString(0)).toSet
    assert(m == Set("t_a")) // b has an in-Next from a
  }

  test("self-loop pattern matches only genuine self-edges") {
    val m = Motif.find(fixture, "(x)-[:Self]->(x)")
      .select(col("x.key")).collect().map(_.getString(0)).toSeq
    assert(m == Seq("t_e"))
  }

  test("anonymous vertices are existential and excluded from output") {
    val m = Motif.find(fixture, "(x)-[:Next]->()")
    assert(m.columns.toSeq == Seq("x"))
    assert(m.select(col("x.key")).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("t_a", "t_b"))
  }

  test("negated self-loop term excludes vertices carrying a self-edge") {
    val m = Motif.find(fixture, "(x)-[e]->(y); !(x)-[:Self]->(x)")
      .select(col("x.key")).distinct().collect().map(_.getString(0)).toSet
    // e matches Next/Shortcut/Self sources {a, b, e}; x=e is excluded
    assert(m == Set("t_a", "t_b"))
  }

  test("bad patterns are rejected") {
    intercept[IllegalArgumentException](Motif.find(fixture, "(a)->(b)"))
    intercept[IllegalArgumentException](Motif.find(fixture, "!(a)-[:X]->(b)"))
    intercept[IllegalArgumentException](Motif.find(fixture, "(a)-[e:X]->(b); (a)-[e:Y]->(b)"))
    // optional term sharing no vertex with the positive pattern
    intercept[IllegalArgumentException](
      Motif.find(fixture, "(a)-[:Next]->(b); ?(x)-[:Next]->(y)"))
  }

  test("undirected term matches both orientations; named edge keeps stored orientation") {
    // fixture edges: a→b, b→c (Next), a→c (Shortcut), self-loop e→e
    val m = Motif.find(fixture, "(x)-[:Next]-(y)")
      .select(col("x.prettyName"), col("y.prettyName"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m == Set(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")), m.toString)
    // named undirected edge reports STORED orientation for both matches
    val e = Motif.find(fixture, "(x)-[ed:Shortcut]-(y)")
      .select(col("x.prettyName"), col("ed.src"), col("ed.dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(e == Set(("A", "t_a", "t_c"), ("C", "t_a", "t_c")), e.toString)
    // undirected negation forbids either orientation: b→c exists, so the
    // undirected anti-term kills both (B,C) and (C,B)... via a bound pair
    val n = Motif.find(fixture, "(x)-[:Next]-(y); !(x)-[:Shortcut]-(y)")
      .select(col("x.prettyName"), col("y.prettyName"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(n == Set(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")), n.toString)
    val n2 = Motif.find(fixture, "(x)-[:Shortcut]-(y); !(x)-[:Next]-(y)")
      .select(col("x.prettyName"), col("y.prettyName"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(n2 == Set(("A", "C"), ("C", "A")), n2.toString)
    // undirected var-length is rejected
    intercept[IllegalArgumentException](Motif.find(fixture, "(x)-[:Next*1..2]-(y)"))
  }

  test("type ascriptions restrict matches, cover anonymous vertices, and must agree") {
    val nodes = Seq(
      NodeRow("c_1", "customer", "C1", "{}"), NodeRow("s_1", "supplier", "S1", "{}"),
      NodeRow("n_1", "nation", "N1", "{}")).toDS()
    val edges = Seq(
      EdgeRow("c_1", "n_1", 1, "InNation", "{}"),
      EdgeRow("s_1", "n_1", 1, "InNation", "{}")).toDS()
    val gr = GraphState(nodes, edges)
    val typed = Motif.find(gr, "(x:customer)-[:InNation]->(n)")
      .select(col("x.key")).collect().map(_.getString(0)).toSeq
    assert(typed == Seq("c_1"), typed.toString)
    // anonymous typed vertex: customers' nations only, via semi-join
    val anon = Motif.find(gr, "(:customer)-[:InNation]->(n)")
      .select(col("n.key")).collect().map(_.getString(0)).toSeq
    assert(anon == Seq("n_1"))
    // untyped matches both
    assert(Motif.find(gr, "(x)-[:InNation]->(n)").count() == 2)
    // conflicting ascriptions on the same variable are rejected
    intercept[IllegalArgumentException](
      Motif.find(gr, "(x:customer)-[:InNation]->(n); (x:supplier)-[:InNation]->(n)"))
  }

  test("variable-length term matches distinct endpoint pairs across the hop range") {
    // chain a→b→c plus shortcut a→c (typed Shortcut, excluded by :Next)
    val m = Motif.find(fixture, "(x)-[:Next*1..2]->(y)")
      .select(col("x.prettyName"), col("y.prettyName"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // 1-hop: A→B, B→C; 2-hop: A→C — distinct pairs, no duplicates
    assert(m == Set(("A", "B"), ("B", "C"), ("A", "C")), m.toString)
    // lo=2 excludes the single hops
    val two = Motif.find(fixture, "(x)-[:Next*2..2]->(y)")
      .select(col("x.prettyName"), col("y.prettyName"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(two == Set(("A", "C")), two.toString)
    // ranged terms compose with plain terms on shared vertices
    val composed = Motif.find(fixture, "(x)-[:Next*1..2]->(y); (x)-[:Shortcut]->(y)")
      .select(col("x.prettyName"), col("y.prettyName"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(composed == Set(("A", "C")), composed.toString)
    // invalid ranges / modifiers are rejected
    intercept[IllegalArgumentException](Motif.find(fixture, "(x)-[:Next*0..2]->(y)"))
    intercept[IllegalArgumentException](Motif.find(fixture, "(x)-[e:Next*1..2]->(y)"))
    intercept[IllegalArgumentException](Motif.find(fixture, "?(x)-[:Next*1..2]->(y)"))
  }

  test("optional term extends matches and null-extends absences (OPTIONAL MATCH)") {
    val m = Motif.find(fixture, "(a)-[:Next]->(b); ?(b)-[:Next]->(c)")
      .select(col("a.prettyName"), col("b.prettyName"), col("c.prettyName"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) "-" else r.getString(2))).toSet
    // a→b extends to c; b→c has no continuation and must SURVIVE with null
    assert(m == Set(("A", "B", "C"), ("B", "C", "-")), m.toString)
    // optional edge binding: the edge struct is null-fielded where absent
    val e = Motif.find(fixture, "(a)-[:Next]->(b); ?(b)-[x:Next]->(c)")
      .select(col("b.prettyName"), col("x.relType"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) "-" else r.getString(1))).toSet
    assert(e == Set(("B", "Next"), ("C", "-")), e.toString)
  }

  test("triangle motif on the TPC-H graph shape (hyperedge fan-out)") {
    // lineitem-shaped hyperedge: h fans out to three typed sinks
    val nodes = Seq(
      NodeRow("h_1", "hyper", "H1", "{}"), NodeRow("o_1", "order", "O1", "{}"),
      NodeRow("p_1", "part", "P1", "{}"), NodeRow("s_1", "supplier", "S1", "{}")).toDS()
    val edges = Seq(
      EdgeRow("h_1", "o_1", 1, "PartOf", "{}"),
      EdgeRow("h_1", "p_1", 1, "OfPart", "{}"),
      EdgeRow("h_1", "s_1", 1, "SuppliedBy", "{}")).toDS()
    val m = Motif.find(GraphState(nodes, edges),
      "(h)-[:PartOf]->(o); (h)-[:OfPart]->(p); (h)-[:SuppliedBy]->(s)")
      .select(col("h.key"), col("o.key"), col("p.key"), col("s.key")).collect()
    assert(m.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq(("h_1", "o_1", "p_1", "s_1")))
  }
}
