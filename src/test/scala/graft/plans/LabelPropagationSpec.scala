package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the synchronous rule. */
  private def ref(edges: Seq[(String, String)], iters: Int): Map[String, String] = {
    val nbrs = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(k => k -> k).toMap
    for (_ <- 1 to iters) {
      labels = nbrs.map { case (v, ns) =>
        val counts = ns.map(labels).groupBy(identity).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def got(edges: Seq[(String, String)], iters: Int): Map[String, String] =
    LabelPropagation.run(edges.toDF("u", "v"), iters)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two cliques joined by a bridge settle into two communities") {
    val cliqueA = for (i <- 1 to 4; j <- (i + 1) to 4) yield (s"a$i", s"a$j")
    val cliqueB = for (i <- 1 to 4; j <- (i + 1) to 4) yield (s"b$i", s"b$j")
    val edges = cliqueA ++ cliqueB :+ ("a1" -> "b1")
    val r = got(edges, 3)
    assert(r == ref(edges, 3))
    // all of clique A share one label, all of clique B another
    assert(Seq("a2", "a3", "a4").map(r).distinct.size == 1)
    assert(Seq("b2", "b3", "b4").map(r).distinct.size == 1)
  }

  test("matches the synchronous reference on random graphs (ties and oscillation included)") {
    val rng = new scala.util.Random(71L)
    for (trial <- 1 to 4) {
      val n = 6 + rng.nextInt(8)
      val edges = Seq.fill(2 * n)((s"v${rng.nextInt(n)}", s"v${rng.nextInt(n)}"))
        .filter(e => e._1 != e._2)
      for (iters <- Seq(0, 1, 3)) {
        assert(got(edges, iters) == ref(edges, iters), s"trial $trial iters $iters: $edges")
      }
    }
  }
}
