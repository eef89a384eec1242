package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the exact max-normalized integer HITS. */
  private def ref(edges: Seq[(String, String)], iters: Int,
                  scale: Long = 1000000L): Map[String, (Long, Long)] = {
    val e = edges.distinct
    val vs = e.flatMap(x => Seq(x._1, x._2)).distinct
    var h = vs.map(_ -> scale).toMap
    var a = vs.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val araw = e.groupBy(_._2).map { case (d, es) => d -> es.map(x => h(x._1)).sum }
      val amx = math.max(if (araw.isEmpty) 1L else araw.values.max, 1L)
      a = vs.map(v => v -> araw.getOrElse(v, 0L) * scale / amx).toMap
      val hraw = e.groupBy(_._1).map { case (s, es) => s -> es.map(x => a(x._2)).sum }
      val hmx = math.max(if (hraw.isEmpty) 1L else hraw.values.max, 1L)
      h = vs.map(v => v -> hraw.getOrElse(v, 0L) * scale / hmx).toMap
    }
    vs.map(v => v -> ((h(v), a(v)))).toMap
  }

  private def got(edges: Seq[(String, String)], iters: Int): Map[String, (Long, Long)] =
    Hits.scaled(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("directed star: the center is the sole full hub, leaves are equal full authorities") {
    val edges = (1 to 5).map(i => ("hub", s"leaf$i"))
    val r = got(edges, iters = 3)
    assert(r("hub") == ((1000000L, 0L)), r.toString)
    (1 to 5).foreach(i => assert(r(s"leaf$i") == ((0L, 1000000L)), r.toString))
    assert(r == ref(edges, 3))
  }

  test("the better-pointed-at authority wins, and its hubs gain from it") {
    // a and b both point at x; only a also points at y. x out-pulls y;
    // hub a out-scores hub b because it points at more authority mass.
    val edges = Seq(("a", "x"), ("b", "x"), ("a", "y"))
    val r = got(edges, iters = 4)
    assert(r("x")._2 == 1000000L && r("y")._2 < 1000000L, r.toString)
    assert(r("a")._1 == 1000000L && r("b")._1 < 1000000L, r.toString)
    assert(r == ref(edges, 4))
  }

  test("randomized digraphs match the reference at several iteration depths") {
    val rng = new scala.util.Random(13)
    val edges = Seq.fill(150)((s"v${rng.nextInt(20)}", s"v${rng.nextInt(20)}"))
      .filter(e => e._1 != e._2)
    for (it <- Seq(1, 2, 5)) assert(got(edges, it) == ref(edges, it), s"iters=$it")
  }
}
