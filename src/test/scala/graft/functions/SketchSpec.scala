package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("small groups (< k distinct) report exactly; estimate tracks large groups within KMV error") {
    val k = 64
    // group "small": 10 distinct values; "big": 5000 distinct values
    val rows = (1 to 10).map(i => ("small", s"s$i")) ++
      (1 to 5000).map(i => ("big", s"b$i")) ++
      (1 to 5000).map(i => ("big", s"b$i"))  // duplicates must not inflate
    val out = Sketch.kmvDistinct(rows.toDF("g", "v"), col("g"), col("v"), k)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("small") == ((10L, 10L)))
    val (exact, est) = out("big")
    assert(exact == 5000L)  // no 28-bit collisions at this size/seed
    // expected relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 3x margin
    assert(math.abs(est - exact).toDouble / exact < 0.38, s"est=$est exact=$exact")
  }

  /** Driver-side reference CMS using the same constants. */
  private def refCms(values: Seq[String], depth: Int, width: Int,
                     probes: Seq[String]): Map[String, Long] = {
    val p = (1L << 31) - 1
    val params = Dedup.permutationParams(depth, 42L)
    def h28(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(7), 16)
    }
    val counters = scala.collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    for (v <- values; ((a, b), i) <- params.zipWithIndex)
      counters((i, ((a * h28(v) + b) % p) % width)) += 1
    probes.map(q => q -> params.zipWithIndex.map { case ((a, b), i) =>
      counters((i, ((a * h28(q) + b) % p) % width))
    }.min).toMap
  }

  test("count-min estimates match the reference and are always >= exact (tiny width forces collisions)") {
    val rng = new scala.util.Random(69L)
    val values = Seq.fill(4000)(s"w${rng.nextInt(80)}")
    val df = values.toDF("v")
    for (width <- Seq(16, 2048)) {
      val counters = Sketch.countMin(df, col("v"), depth = 4, width = width)
      val probeVals = (0 until 80 by 7).map(i => s"w$i")
      val probes = probeVals.toDF("v")
      val got = Sketch.cmsEstimate(counters, probes, col("v"), depth = 4, width = width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == refCms(values, 4, width, probeVals), s"width=$width")
      val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      probeVals.foreach { q =>
        assert(got(q) >= exact.getOrElse(q, 0L), s"CMS must never underestimate: $q")
      }
    }
  }

  test("histogram quantiles: estimated bin is the floor of the exact kth-smallest value") {
    val rng = new scala.util.Random(70L)
    val rows = (for (g <- Seq("a", "b"); _ <- 1 to 500)
      yield (g, rng.nextDouble() * (if (g == "a") 100 else 13))).toSeq
    val qs = Seq(250, 500, 950, 990, 1000)
    val got = Sketch.histogramQuantiles(rows.toDF("g", "v"), col("g"), col("v"), qs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (g <- Seq("a", "b"); q <- qs) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val target = (q.toLong * vs.size + 999) / 1000  // ceil(q/1000 * N)
      val expected = math.floor(vs(target.toInt - 1)).toLong
      assert(got((g, q)) == expected, s"g=$g q=$q")
    }
  }

  test("estimate is partition-invariant (the sketch merges, it doesn't sample)") {
    val rows = (1 to 3000).map(i => ("g", s"v$i"))
    def run(parts: Int) =
      Sketch.kmvDistinct(rows.toDF("g", "v").repartition(parts), col("g"), col("v"), 32)
        .collect()(0).getLong(2)
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("Misra-Gries candidates contain every item above the N/(k+1) guarantee, any partitioning") {
    val rng = new scala.util.Random(71L)
    // 1000 'hot', 600 'warm', 2400 spread over 120 cold items; N=4000
    val items = rng.shuffle(
      Seq.fill(1000)("hot") ++ Seq.fill(600)("warm") ++
        (1 to 2400).map(i => s"cold${i % 120}"))
    for (parts <- Seq(1, 3, 17)) {
      val cands = Sketch.misraGriesCandidates(
        items.toDF("t").repartition(parts), col("t"), k = 4)
      // guarantee: freq > N/(k+1) = 800 → 'hot' must survive any order
      assert(cands.contains("hot"), s"parts=$parts cands=$cands")
      assert(cands.size <= 4, s"summary exceeded k: $cands")
    }
  }

  test("heavy hitters: empty input yields empty output; k=1 finds only a strict majority") {
    import spark.implicits._
    assert(Sketch.heavyHitters(Seq.empty[String].toDF("t"), col("t"), 8).count() == 0)
    // k=1: only an item with freq > N survives — impossible, so empty...
    val noMajority = Seq("a", "a", "b").toDF("t")
    assert(Sketch.heavyHitters(noMajority, col("t"), 1).count() == 0)
    // ...but k=2 finds the strict majority item
    val got = Sketch.heavyHitters(noMajority, col("t"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L))
  }

  test("heavy hitters output is exact and partition-invariant despite the order-dependent summary") {
    val rng = new scala.util.Random(72L)
    val items = rng.shuffle(
      Seq.fill(900)("a") ++ Seq.fill(500)("b") ++ Seq.fill(140)("c") ++
        (1 to 1000).map(i => s"z${i % 200}"))
    val k = 8
    val n = items.size // 2540; threshold n/k = 317.5 → {a, b}
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * k > n).toMap
    for (parts <- Seq(1, 5, 32)) {
      val got = Sketch.heavyHitters(items.toDF("t").repartition(parts), col("t"), k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  /** Driver-side HLL reference over gramHash semantics (first 7 md5 hex
    * chars → 28-bit long), m = 64.
    */
  private def refHll(values: Seq[String]): (Int, Long, Long) = {
    def h28(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    val regs = values.distinct.map(h28).distinct
      .groupBy(_ % 64)
      .map { case (b, hs) =>
        b -> hs.map { h =>
          val r = h / 64
          if (r == 0) 23 else 23 - java.lang.Long.toBinaryString(r).length
        }.max
      }
    val nBuckets = regs.size
    val checksum = regs.map { case (b, m) => m.toLong * (b + 1) }.sum
    val sObs = regs.values.map(m => math.pow(2.0, -m.toDouble)).sum
    val v = 64 - nBuckets
    val raw = 0.709 * 4096.0 / (v + sObs)
    val est = if (v > 0 && raw <= 160.0) 64.0 * math.log(64.0 / v) else raw
    (nBuckets, checksum, math.rint(est * 1000000.0).toLong)
  }

  test("HLL: registers and estimate match the reference; accuracy within the m=64 error bound") {
    val rng = new scala.util.Random(91L)
    val big = Seq.fill(4000)(s"tok${rng.nextInt(1500)}")   // raw branch
    val small = (1 to 20).map(i => s"s$i")                 // linear-counting branch
    for ((vals, label) <- Seq((big, "big"), (small, "small"))) {
      val df = vals.map(("g", _)).toDF("g", "t")
      val got = Sketch.hllEstimate(Sketch.hllRegisters(df, col("g"), col("t")))
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).head
      assert(got == refHll(vals), label)
      // estimate within ~3 standard errors (1.04/√64 = 13 %) of truth
      val truth = vals.distinct.size.toDouble
      val est = got._3 / 1e6
      assert(math.abs(est - truth) / truth < 0.39, s"$label est=$est truth=$truth")
    }
  }

  test("HLL: max-merged wave registers equal the one-shot sketch (idempotent, order-free)") {
    val rng = new scala.util.Random(92L)
    val vals = Seq.fill(3000)(s"w${rng.nextInt(900)}")
    val df = vals.zipWithIndex.map { case (v, i) => ("g", v, i % 3) }.toDF("g", "t", "w")
    val oneShot = Sketch.hllRegisters(df, col("g"), col("t"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    // waves 0/1/2 max-merged — wave 1 replayed twice to prove idempotence
    val waves = Seq(0, 1, 1, 2).map(w =>
      Sketch.hllRegisters(df.filter(col("w") === w), col("g"), col("t")))
    val merged = waves.reduce(_ unionByName _)
      .groupBy("grp", "bucket").agg(max(col("m_j")).as("m_j"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(merged == oneShot)
  }

  test("minhashSimilarityMatrix: identical sources read 1000 permille, disjoint read 0; estimate tracks exact") {
    import spark.implicits._
    val vocabA = (0 until 300).map(i => s"tok$i")
    val vocabC = (300 until 600).map(i => s"tok$i")
    val rows = vocabA.map(("A", _)) ++ vocabA.map(("B", _)) ++ vocabC.map(("C", _))
    val out = Sketch.minhashSimilarityMatrix(rows.toDF("src", "t"),
        col("src"), col("t"), k = 64)
      .orderBy("source_a", "source_b").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(4), r.getLong(7)))).toMap
    // A == B exactly: both estimate and exact are 1000 permille
    assert(out(("A", "B")) == ((1000L, 1000L)))
    // A and C are disjoint: both are 0
    assert(out(("A", "C")) == ((0L, 0L)))
    assert(out(("B", "C")) == ((0L, 0L)))
    // half-overlap: estimate within sketch error of the exact 1/3
    val vocabD = (0 until 150).map(i => s"tok$i") ++ (600 until 750).map(i => s"tok$i")
    val rows2 = vocabA.map(("A", _)) ++ vocabD.map(("D", _))
    val half = Sketch.minhashSimilarityMatrix(rows2.toDF("src", "t"),
        col("src"), col("t"), k = 64)
      .collect().map(r => (r.getLong(4), r.getLong(7))).head
    assert(half._2 == 1000L / 3) // exact: 150 / 450
    assert(math.abs(half._1 - half._2) < 200, s"estimate ${half._1} vs exact ${half._2}")
  }

  test("cmsJoinSize: self inner product >= exact F2, exact when collision-free") {
    import spark.implicits._
    // 3 distinct keys with counts 3, 2, 1 → exact self-join size 14;
    // width 2048 makes a 3-key collision essentially impossible for
    // this fixed seed, so every row's dot product is exactly 14
    val keys = Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")
    val df = keys.toDF("k")
    val cms = Sketch.countMin(df, col("k"), depth = 4, width = 2048)
    val est = Sketch.cmsJoinSize(cms, cms).head().getLong(0)
    assert(est == 14L)
  }

  test("cmsJoinSize: two-sided estimate >= exact join size, tight without collisions") {
    import spark.implicits._
    // A = {a×2, b×1}, B = {a×3, c×5} → |A ⋈ B| = 2·3 = 6
    val a = (Seq.fill(2)("a") ++ Seq("b")).toDF("k")
    val b = (Seq.fill(3)("a") ++ Seq.fill(5)("c")).toDF("k")
    val ca = Sketch.countMin(a, col("k"))
    val cb = Sketch.countMin(b, col("k"))
    val est = Sketch.cmsJoinSize(ca, cb).head().getLong(0)
    assert(est == 6L)
  }
}
