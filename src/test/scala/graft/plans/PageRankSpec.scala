package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the exact integer recurrence. */
  private def ref(edges: Seq[(String, String)], iters: Int,
                  scale: Long = 1000000L): Map[String, Long] = {
    val e = edges.distinct
    val vs = e.flatMap(x => Seq(x._1, x._2)).distinct
    val od = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = vs.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inc = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => r(x._1) / od(x._1)).sum
      }
      r = vs.map(v => v -> (scale / 100 * 15 + 85 * inc.getOrElse(v, 0L) / 100)).toMap
    }
    r
  }

  private def got(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    PageRank.ranksScaled(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("matches the integer recurrence on a chain, a cycle, and a random graph") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    assert(got(chain, 4) == ref(chain, 4))
    val cycle = Seq("x" -> "y", "y" -> "z", "z" -> "x")
    assert(got(cycle, 3) == ref(cycle, 3))
    val rng = new scala.util.Random(68L)
    val rand = Seq.fill(40)((s"v${rng.nextInt(12)}", s"v${rng.nextInt(12)}"))
      .filter(e => e._1 != e._2)
    assert(got(rand, 4) == ref(rand, 4))
  }

  test("zero iterations returns the uniform start; duplicate edges collapse") {
    val dup = Seq("a" -> "b", "a" -> "b", "b" -> "a")
    assert(got(dup, 0) == Map("a" -> 1000000L, "b" -> 1000000L))
    // after one round each side gets base + 85% of the other's full rank
    // (duplicates collapsed, so outdeg is 1, not 2)
    assert(got(dup, 1) == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("dangling vertices keep the teleport base; sink accumulates") {
    val star = Seq("a" -> "s", "b" -> "s", "c" -> "s")
    val r = got(star, 2)
    assert(r("a") == 150000L && r("b") == 150000L && r("c") == 150000L)
    assert(r == ref(star, 2))
  }
}
