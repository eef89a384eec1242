package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperAnfSpec extends SparkSpec {
  import spark.implicits._

  private val M = 16

  /** The operator's exact 60-bit md5 hash. */
  private def h60(x: Long, salt: String = "anf:"): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt$x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def initRegs(x: Long): Array[Int] = {
    val h = h60(x)
    val bkt = (h & (M - 1)).toInt
    val w = h >> 4
    val rank = if (w == 0L) 57 else 57 - w.toBinaryString.length
    val a = Array.fill(M)(0); a(bkt) = rank; a
  }

  /** Per-vertex estimate with the operator's exact expression order. */
  private def est(regs: Array[Int]): Double = {
    val z = regs.foldLeft(0.0)((acc, r) => acc + 1.0 / (1L << r).toDouble)
    val vz = regs.count(_ == 0)
    val raw = (0.673 * M * M) / z
    if (raw <= 2.5 * M && vz > 0) M * math.log(M.toDouble / vz) else raw
  }

  private def round0(d: Double): Long =
    BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Sequential reference: closed-neighborhood register max rounds. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long)] = {
    val und = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val vs = und.flatMap(p => Seq(p._1, p._2)).distinct
    val nbrs: Map[Long, Seq[Long]] = vs.map { v =>
      v -> (und.collect { case (a, b) if a == v => b } ++
        und.collect { case (a, b) if b == v => a } :+ v)
    }.toMap
    var regs: Map[Long, Array[Int]] = vs.map(v => v -> initRegs(v)).toMap
    def stats(r: Int) = (r,
      regs.values.map(_.map(_.toLong).sum).sum,
      regs.values.map(a => round0(est(a) * 1e6)).sum)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)](stats(0))
    for (r <- 1 to rounds) {
      regs = vs.map { v =>
        v -> (0 until M).map(j => nbrs(v).map(n => regs(n)(j)).max).toArray
      }.toMap
      out += stats(r)
    }
    out.toSeq
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long)] =
    HyperAnf.trajectory(edges.toDF("u", "v"), rounds)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  test("matches the sequential reference on a path graph") {
    val path = (0L until 8L).map(i => (i, i + 1))
    assert(run(path, 3) === reference(path, 3))
  }

  test("matches the sequential reference on two components + duplicate edges") {
    val g = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (5L, 6L), (6L, 7L), (3L, 3L))
    assert(run(g, 3) === reference(g, 3))
  }

  test("register mass is monotone and reaches the diameter fixpoint") {
    val path = (0L until 6L).map(i => (i, i + 1)) // 7 vertices, diameter 6
    val t = run(path, 7)
    val mass = t.map(_._2)
    assert(mass == mass.sorted, s"register mass must be monotone: $mass")
    // past the diameter, every ball is the whole component: rounds
    // 6 and 7 must be identical in both mass and estimate
    assert(t(6)._2 == t(7)._2 && t(6)._3 == t(7)._3, t.toString)
  }

  test("round-0 estimate of singleton balls is near the vertex count") {
    // 20 isolated-pair vertices: every ball at r=0 has size 1; the HLL
    // linear-counting branch must estimate each as ~1 (V=15 zeros of 16
    // → 16·ln(16/15) ≈ 1.0323), so nf_micro ≈ n · 1.0323e6
    val g = (0L until 20L by 2).map(i => (i, i + 1))
    val t = run(g, 1)
    val n = 20
    val per = 16.0 * math.log(16.0 / 15.0)
    // the linear-counting branch depends only on the zero count, so
    // every singleton ball lands on the identical literal
    assert(t.head._3 === n * round0(per * 1e6),
      s"round-0 nf_micro ${t.head._3} vs expected ${n * per * 1e6}")
  }

  test("PROPERTY: random multigraphs match the sequential reference") {
    for (seed <- 9L to 11L) {
      val g = GraphGen.randGraph(seed, n = 14, m = 24)
        .filter(p => p._1 != p._2) // reference keys nbrs by canonical edges
      assert(run(g, 3) === reference(g, 3), s"seed $seed: $g")
    }
  }

  test("rejects non-positive maxRounds") {
    intercept[IllegalArgumentException] {
      HyperAnf.trajectory(Seq((0L, 1L)).toDF("u", "v"), 0)
    }
  }

  test("incremental edge arrival converges to the one-shot fixpoint (max-monotone registers)") {
    // the incremental-maintenance argument for ANF sketches at 100 TB:
    // registers only ever advance (element-wise max), so running rounds
    // on a PARTIAL edge set and then continuing on the full set reaches
    // the same fixpoint as a fresh full-graph run — stale partial state
    // can never overshoot, only lag. Demonstrated by: fresh(full, d)
    // equals the final row of a run whose early rounds saw only wave 1.
    val wave1 = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val wave2 = Seq((3L, 4L), (4L, 5L), (5L, 0L)) // closes the cycle
    val full = wave1 ++ wave2
    val d = 6 // past the merged graph's diameter
    val fresh = run(full, d).last

    // staged run: advance registers on wave 1 only, then merge wave 2's
    // edges and continue — reuse the operator's own stages
    val undFull = full.toDF("u", "v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v")).distinct()
    val adjFull = undFull.select($"u".as("x"), $"v".as("y"))
      .unionAll(undFull.select($"v".as("x"), $"u".as("y")))
    val vertsFull = adjFull.select($"x").distinct()
    val adjSelfFull = adjFull.unionAll(vertsFull.select($"x", $"x".as("y")))
    val und1 = wave1.toDF("u", "v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v")).distinct()
    val adj1 = und1.select($"u".as("x"), $"v".as("y"))
      .unionAll(und1.select($"v".as("x"), $"u".as("y")))
    // wave-1 closed adjacency over ALL vertices (isolated-for-now
    // vertices carry their own registers forward)
    val adjSelf1 = adj1.unionAll(vertsFull.select($"x", $"x".as("y")))

    var regs = HyperAnf.initRegisters(vertsFull, "anf:")
    (1 to 3).foreach(_ => regs = HyperAnf.roundMax(adjSelf1, regs))
    (1 to d).foreach(_ => regs = HyperAnf.roundMax(adjSelfFull, regs))

    val regCols = (0 until M).map(j => col(s"rg$j"))
    val sumReg = regCols.map(_.cast("long")).reduceLeft(_ + _)
    val nfTerm = org.apache.spark.sql.functions.round(HyperAnf.estimate(regCols) * lit(1e6))
      .cast("long")
    val row = regs.agg(sum(sumReg), sum(nfTerm)).head()
    assert((row.getLong(0), row.getLong(1)) === ((fresh._2, fresh._3)),
      s"staged fixpoint ${(row.getLong(0), row.getLong(1))} vs fresh $fresh")
  }
}
