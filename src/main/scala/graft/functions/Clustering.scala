package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering and compression: spherical k-means (Lloyd
  * iterations) and int8 scalar quantization.
  *
  * Scale shape: both operators follow the broadcast-constant pattern —
  * the only driver-side state is K×dim centroids / dim×2 quantization
  * bounds (a few KB regardless of corpus size). Per iteration, k-means
  * is one map-side assignment pass (K rounded-cosine argmax per row,
  * inside codegen via the native ArrayDot) plus one partial-aggregated
  * mean; quantization is purely map-side once the bounds exist. Nothing
  * ever shuffles the corpus itself.
  *
  * Cross-engine determinism (repo convention): assignment uses the
  * ROUNDED cosine with an explicit tie-break toward the smaller cluster,
  * and the centroid mean is accumulation-order INDEPENDENT — each
  * component is pre-rounded to an integer 1e-6 grid and summed as exact
  * longs before dividing (the same integer-exactness pattern
  * [[scalarQuantize]] uses), so any engine re-running the recurrence from
  * the same init lands on identical 4-dp centroids regardless of
  * partition or accumulation order. (A plain `avg` over doubles is NOT
  * order-stable; 4-dp rounding can flip at boundaries and iteration 2
  * amplifies any flipped component.)
  */
object Clustering {

  /** Assign every row to the argmax-cosine centroid (ties → smaller
    * cluster id). `cents` is the broadcast-by-construction literal list.
    */
  def assignClusters(df: DataFrame, id: Column, vec: Column,
                     cents: Seq[(Int, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "assignClusters needs at least one centroid")
    val data = df.select(id.as("id"), vec.as("v"))
      .withColumn("nv", Similarity.norm(col("v")))
    val scored = cents.map { case (k, c) =>
      val cNorm = math.sqrt(c.map(x => x * x).sum)
      struct(
        round(Similarity.dot(col("v"), array(c.map(lit): _*)) / (col("nv") * lit(cNorm)), 6)
          .as("cos"),
        lit(-k).as("nc"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    data.select(col("id"), col("v"), (best.getField("nc") * -1).as("cluster"))
  }

  /** [[assignClusters]] with the centroid set as a broadcast DataFrame
    * `(cluster, cvec)` instead of a driver-side literal list — the shape
    * that survives a centroid count DERIVED from corpus mass
    * ([[graft.functions.Dedup.semDedupAuto]]): a K-branch `greatest`
    * expression tree stops compiling usefully past a few dozen
    * centroids, while the broadcast nested-loop product scales in K and
    * never collects a vector to the driver. Same math, bit-identical
    * assignment: rounded-to-6dp cosine, argmax with ties to the smaller
    * cluster id, realized as `max(struct(cos, -cluster, nv, v))` — the
    * (cos, -cluster) prefix is distinct per (row, centroid) so the
    * lexicographic max never tie-breaks on the payload fields, and the
    * partial aggregate collapses each partition's n·K products back to
    * n rows before any shuffle.
    */
  def assignClustersBroadcast(df: DataFrame, id: Column, vec: Column,
                              cents: DataFrame): DataFrame = {
    val data = df.select(id.as("id"), vec.as("v"))
      .withColumn("nv", Similarity.norm(col("v")))
    val c = broadcast(cents.select(col("cluster"),
      col("cvec"), Similarity.norm(col("cvec")).as("ncv")))
    data.crossJoin(c)
      .select(col("id"),
        struct(
          round(Similarity.dot(col("v"), col("cvec")) / (col("nv") * col("ncv")), 6)
            .as("cos"),
          (-col("cluster")).as("nc"),
          col("nv").as("nv"), col("v").as("v")).as("s"))
      .groupBy("id").agg(max(col("s")).as("m"))
      .select(col("id"), col("m.v").as("v"), (col("m.nc") * -1).as("cluster"),
        col("m.nv").as("nv"))
  }

  /** Spherical k-means (cosine Lloyd iterations) from a deterministic
    * initial centroid list; returns the final centroids in long format
    * `(cluster, pos, c)` with 4-dp rounded components. Clusters that end
    * an iteration empty drop out (no rows to average) — mirrored by any
    * engine re-running the same recurrence.
    *
    * The per-component mean is computed as `round(Σ round(x·1e6) /
    * (n·1e6), 4)` with the sum over exact longs: integer addition
    * commutes, so the centroid is bit-identical no matter how Spark (or
    * an oracle engine) orders the accumulation — a plain `avg(double)`
    * is not, which made 4-dp rounding flip at boundaries. A final
    * `+ 0.0` normalizes IEEE negative zero (engines disagree on the
    * sign bit `round` leaves on a tiny negative mean; `-0.0 + 0.0`
    * is `+0.0`, every other value is unchanged).
    */
  def sphericalKMeans(df: DataFrame, id: Column, vec: Column,
                      init: Seq[(Int, Seq[Double])], iters: Int): DataFrame = {
    require(iters >= 1, "sphericalKMeans needs at least one iteration")
    var cents = init.sortBy(_._1)
    for (_ <- 1 to iters) {
      val centRows = assignClusters(df, id, vec, cents)
        .select(col("cluster"), posexplode(col("v").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg((round(sum(round(col("x") * lit(1e6)).cast("long")).cast("double")
          / (count(lit(1)) * lit(1e6)), 4) + lit(0.0)).as("c"))
        .collect() // K×dim rows — broadcast-constant scale, not a corpus collect
      cents = centRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    cents.flatMap { case (k, cs) =>
      cs.zipWithIndex.map { case (c, p) => (k, p, c) }
    }.toDF("cluster", "pos", "c")
  }

  /** Per-dimension (min, max) over the corpus, collected driver-side —
    * order-independent extremes (exact even over floats; min/max commute,
    * so any partitioning yields the same bounds).
    *
    * One per-partition primitive fold over the scanned rows (genuine
    * per-partition imperative logic — the documented case for dropping
    * below the DataFrame API), then a dim-sized combine: the shuffle
    * carries one 2×dim vector PER PARTITION. The previous `posexplode`
    * form moved corpus×dim exploded rows over the network — exactly the
    * explosion a 100 TB corpus cannot afford — and a 2×dim-column
    * aggregate blows past codegen method limits for wide vectors.
    */
  def dimMinMax(df: DataFrame, vec: Column): Seq[(Double, Double)] = {
    val staged = df.select(vec.cast("array<double>").as("__v"))
    val parts = staged.queryExecution.toRdd.mapPartitions { it =>
      var mn: Array[Double] = null
      var mx: Array[Double] = null
      while (it.hasNext) {
        val row = it.next()
        if (!row.isNullAt(0)) { // null vectors carry no bounds
          val arr = row.getArray(0).toDoubleArray()
          if (mn == null) { mn = arr.clone(); mx = arr.clone() }
          else {
            if (arr.length > mn.length) {
              // ragged input: a position's bounds come from the rows
              // that HAVE that position (the posexplode semantics)
              val old = mn.length
              mn = java.util.Arrays.copyOf(mn, arr.length)
              mx = java.util.Arrays.copyOf(mx, arr.length)
              var j = old
              while (j < arr.length) { mn(j) = arr(j); mx(j) = arr(j); j += 1 }
            }
            var i = 0
            while (i < arr.length) {
              if (arr(i) < mn(i)) mn(i) = arr(i)
              if (arr(i) > mx(i)) mx(i) = arr(i)
              i += 1
            }
          }
        }
      }
      if (mn == null) Iterator.empty else Iterator((mn, mx))
    }
    // treeAggregate, not reduce: the zero makes an empty (or all-null)
    // corpus yield Seq.empty instead of throwing, and the tree combine
    // keeps the driver from absorbing every partition's pair at once
    val combined = parts.treeAggregate(Option.empty[(Array[Double], Array[Double])])(
      (acc, p) => Some(acc.fold(p)(combineBounds(_, p))),
      (a, b) => (a, b) match {
        case (Some(x), Some(y)) => Some(combineBounds(x, y))
        case _ => a.orElse(b)
      })
    combined.fold(Seq.empty[(Double, Double)]) { case (mins, maxs) => mins.zip(maxs).toSeq }
  }

  /** Merge two (min, max) bound pairs of possibly different widths:
    * shared positions take the tighter extreme, extra positions pass
    * through (never mutates its inputs — partition results are reused
    * by the tree combine).
    */
  private def combineBounds(a: (Array[Double], Array[Double]),
                            b: (Array[Double], Array[Double])): (Array[Double], Array[Double]) = {
    val ((shortMn, shortMx), (longMn, longMx)) =
      if (a._1.length <= b._1.length) (a, b) else (b, a)
    val mn = longMn.clone(); val mx = longMx.clone()
    var i = 0
    while (i < shortMn.length) {
      if (shortMn(i) < mn(i)) mn(i) = shortMn(i)
      if (shortMx(i) > mx(i)) mx(i) = shortMx(i)
      i += 1
    }
    (mn, mx)
  }

  /** Int8 scalar quantization against per-dimension bounds:
    * `code = floor(round((x − mn)·(255/(mx − mn)), 6) + 0.5)` (0 for a
    * constant dimension). Emits per-vector integrity/fidelity stats:
    * exact integer code sum and position-weighted checksum, plus the max
    * dequantization error. Entirely map-side — the corpus is never
    * exploded or shuffled; the bounds travel inside the native
    * [[graft.functions.expressions.QuantizeStats]] expression (one
    * compiled pass per row; the previous `transform` + 3×`aggregate`
    * Column form was CodegenFallback and ~0.5 ms/row — QuantizeStatsSpec
    * pins bit-equality against that formulation).
    */
  def scalarQuantize(df: DataFrame, id: Column, vec: Column,
                     bounds: Seq[(Double, Double)]): DataFrame = {
    require(bounds.nonEmpty, "scalarQuantize needs per-dimension bounds")
    val q = graft.functions.expressions.QuantizeOps.quantizeStatsCol(vec, bounds)
    df.select(id.as("vec_id"), q.as("q"))
      .select(col("vec_id"), col("q.code_sum").as("code_sum"),
        col("q.code_checksum").as("code_checksum"), col("q.max_err").as("max_err"))
  }

  /** Driver-side twin of [[graft.functions.expressions.QuantizeOps]]'
    * per-position code — encodes one (constant) vector, e.g. the query
    * for [[quantizedDotTopK]], with bit-identical semantics to the
    * executor path (same `(x − mn)·(255/(mx − mn))` constant-fold order,
    * same HALF_UP round-6 before the +0.5/floor).
    */
  def quantizeVector(v: Seq[Double], bounds: Seq[(Double, Double)]): Seq[Int] = {
    require(v.length == bounds.length,
      s"quantizeVector length mismatch: vector ${v.length} vs bounds ${bounds.length}")
    v.zip(bounds).map { case (x, (mn, mx)) =>
      if (mx > mn) {
        val s = 255.0 / (mx - mn)
        val r = BigDecimal((x - mn) * s)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        math.floor(r + 0.5).toInt
      } else 0
    }
  }

  /** Candidate generation over the int8 scalar-quantized store: top-k by
    * the INTEGER dot product of the row's codes against a constant
    * query-code vector. This is the first stage of the two-stage ANN
    * layout a quantized index serves — scores are exact integers (codes
    * ≤ 255, so a 64-dim dot fits a long with room to spare), which makes
    * the ranking a pure function of the input on every engine.
    *
    * Scale shape: the score is a FIXED expression tree of per-position
    * scalar terms (`element_at` + the quantize arithmetic, all codegen —
    * no higher-order array function in the hot path, the same reason
    * [[scalarQuantize]] grew a native expression); zero-code query
    * positions drop out of the tree entirely. One corpus scan, map-side
    * only, TakeOrdered top-k — the bounds and query codes are a few
    * hundred bytes of broadcast constants.
    */
  def quantizedDotTopK(df: DataFrame, id: Column, vec: Column,
                       bounds: Seq[(Double, Double)], queryCodes: Seq[Int],
                       k: Int): DataFrame = {
    require(queryCodes.length == bounds.length,
      s"query codes ${queryCodes.length} vs bounds ${bounds.length}")
    require(k >= 1, s"k must be positive: $k")
    val terms: Seq[Column] = queryCodes.zipWithIndex.collect {
      case (qc, i) if qc != 0 =>
        val (mn, mx) = bounds(i)
        val code: Column =
          if (mx > mn) {
            val s = 255.0 / (mx - mn)
            floor(round((element_at(vec, i + 1).cast("double") - lit(mn)) * lit(s), 6)
              + lit(0.5)).cast("long")
          } else lit(0L)
        code * lit(qc.toLong)
    }
    val score = terms.reduceOption(_ + _).getOrElse(lit(0L))
    df.select(id.as("id"), score.as("qdot"))
      .orderBy(col("qdot").desc, col("id"))
      .limit(k)
  }
}
