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

  /** Driver-side reference of the PERSONALIZED integer recurrence:
    * teleport (initial mass + per-round restart) only on seeds.
    */
  private def refP(edges: Seq[(String, String)], seeds: Set[String], iters: Int,
                   scale: Long = 1000000L): Map[String, Long] = {
    val e = edges.distinct
    val vs = e.flatMap(x => Seq(x._1, x._2)).distinct
    val od = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = vs.map(v => v -> (if (seeds(v)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val inc = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => r(x._1) / od(x._1)).sum
      }
      r = vs.map(v => v ->
        ((if (seeds(v)) scale / 100 * 15 else 0L) + 85 * inc.getOrElse(v, 0L) / 100)).toMap
    }
    r
  }

  private def gotP(edges: Seq[(String, String)], seedPrefix: String,
                   iters: Int): Map[String, Long] =
    PageRank.personalizedScaled(edges.toDF("src", "dst"),
        col("key").startsWith(seedPrefix), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("personalized: matches the seeded recurrence; non-seeds start at zero") {
    val chain = Seq("s1" -> "a", "a" -> "b", "b" -> "c", "s2" -> "b")
    val seeds = Set("s1", "s2")
    assert(gotP(chain, "s", 0) ==
      Map("s1" -> 1000000L, "s2" -> 1000000L, "a" -> 0L, "b" -> 0L, "c" -> 0L))
    for (it <- Seq(1, 3, 5)) assert(gotP(chain, "s", it) == refP(chain, seeds, it))
    // mass decays with distance from the seed along a PURE chain (the
    // two-seed graph above compounds mass into b/c, so decay is only
    // monotone when each vertex has a single feed)
    val pure = Seq("s1" -> "a", "a" -> "b", "b" -> "c")
    val r = gotP(pure, "s", 4)
    assert(r("s1") > r("a") && r("a") > r("b") && r("b") > r("c") && r("c") > 0L)
    assert(r == refP(pure, Set("s1"), 4))
    // an unreached component (no path from any seed) carries exactly 0
    val twoComp = chain ++ Seq("x" -> "y", "y" -> "x")
    val r2 = gotP(twoComp, "s", 4)
    assert(r2("x") == 0L && r2("y") == 0L)
    assert(r2 == refP(twoComp, Set("s1", "s2"), 4))
  }

  test("weighted: w==1 equals uniform; weights steer mass; duplicates sum") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")).toDF("src", "dst")
    val uni = PageRank.ranksScaled(e, iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val w1 = PageRank.weightedRanksScaled(e.withColumn("w", lit(1L)), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(uni == w1)
    // a splits 3:1 toward b — hand recurrence, scale 1e6, damp 85/100:
    //   contrib a→b = r(a)*3 div 4, a→c = r(a)*1 div 4
    val ew = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val got = PageRank.weightedRanksScaled(ew, iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    def step(r: Map[String, Long]): Map[String, Long] = Map(
      "a" -> (150000L + 85L * (r("b") + r("c")) / 100L),
      "b" -> (150000L + 85L * (r("a") * 3L / 4L) / 100L),
      "c" -> (150000L + 85L * (r("a") * 1L / 4L) / 100L))
    val want = step(step(Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L)))
    assert(got == want)
    assert(got("b") > got("c"), "heavier edge must carry more mass")
    // duplicate (src,dst) rows collapse by weight SUM (multigraph):
    // a→b w=2 + a→b w=1 ≡ a→b w=3
    val dup = Seq(("a", "b", 2L), ("a", "b", 1L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)).toDF("src", "dst", "w")
    val got2 = PageRank.weightedRanksScaled(dup, iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got2 == want)
  }

  test("personalized with all vertices seeded equals global pagerank") {
    val rng = new scala.util.Random(77L)
    val rand = Seq.fill(30)((s"v${rng.nextInt(10)}", s"v${rng.nextInt(10)}"))
      .filter(e => e._1 != e._2)
    assert(gotP(rand, "v", 3) == ref(rand, 3))
  }
}
