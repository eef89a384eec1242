package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def score(edges: Seq[(String, String)], labels: Seq[(String, String)]) =
    Modularity.score(edges.toDF("u", "v"), labels.toDF("key", "label"))
      .collect()(0)

  test("two triangles bridged by one edge, labeled by triangle") {
    // m = 7, internal = 6; degrees 2,2,3 per triangle → d_c = 7 each;
    // Q = (4·7·6 − 98)/196 = 70/196 → q_micro = round(357142.857) = 357143
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d"))
    val l = Seq("a", "b", "c").map(_ -> "t1") ++ Seq("d", "e", "f").map(_ -> "t2")
    val r = score(e, l)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((7L, 6L, 0L, 2L, 6L, 357143L)))
  }

  test("one community scores zero; disjoint cliques score +1/2; anti-labeling negative") {
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    // all-in-one: Q = (4m·m − (2m)²)/4m² = 0
    assert(score(tri, Seq("a", "b", "c").map(_ -> "all")).getLong(5) === 0L)
    // two disjoint triangles, one label each: Q = (144 − 72)/144 = 1/2
    val two = tri ++ Seq(("d", "e"), ("e", "f"), ("f", "d"))
    val l2 = Seq("a", "b", "c").map(_ -> "t1") ++ Seq("d", "e", "f").map(_ -> "t2")
    assert(score(two, l2).getLong(5) === 500000L)
    // single edge split across labels: num = −2, den = 4 → −500000
    // (exercises the sign-safe round-half-up path)
    assert(score(Seq(("a", "b")), Seq("a" -> "x", "b" -> "y")).getLong(5)
      === -500000L)
  }

  test("unlabeled vertices are reported, not silently dropped") {
    val e = Seq(("a", "b"), ("b", "c"))
    val r = score(e, Seq("a" -> "x", "b" -> "x")) // c unlabeled
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 1L)
    assert(r.getLong(4) === 1L) // only (a,b) counts as internal
  }

  test("edge canonicalization: duplicates, reversals, self-loops") {
    val e = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("a", "b"))
    val r = score(e, Seq("a" -> "x", "b" -> "x"))
    assert(r.getLong(0) === 1L)
    assert(r.getLong(5) === 0L) // one community → 0
  }
}
