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
    * is not, which made 4-dp rounding flip at boundaries.
    */
  def sphericalKMeans(df: DataFrame, id: Column, vec: Column,
                      init: Seq[(Int, Seq[Double])], iters: Int): DataFrame = {
    require(iters >= 1, "sphericalKMeans needs at least one iteration")
    var cents = init.sortBy(_._1)
    for (_ <- 1 to iters) {
      val centRows = assignClusters(df, id, vec, cents)
        .select(col("cluster"), posexplode(col("v").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(round(sum(round(col("x") * lit(1e6)).cast("long")).cast("double")
          / (count(lit(1)) * lit(1e6)), 4).as("c"))
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
    * `dim` groups, order-independent extremes (exact even over floats).
    */
  def dimMinMax(df: DataFrame, vec: Column): Seq[(Double, Double)] =
    df.select(posexplode(vec.cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos")
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq

  /** Int8 scalar quantization against per-dimension bounds:
    * `code = floor(round((x − mn)·(255/(mx − mn)), 6) + 0.5)` (0 for a
    * constant dimension). Emits per-vector integrity/fidelity stats:
    * exact integer code sum and position-weighted checksum, plus the max
    * dequantization error. Entirely map-side — the corpus is never
    * exploded or shuffled; the bounds ride along as array literals.
    */
  def scalarQuantize(df: DataFrame, id: Column, vec: Column,
                     bounds: Seq[(Double, Double)]): DataFrame = {
    require(bounds.nonEmpty, "scalarQuantize needs per-dimension bounds")
    val dim = bounds.length
    val mnA = array(bounds.map(b => lit(b._1)): _*)
    val mxA = array(bounds.map(b => lit(b._2)): _*)
    val v = vec.cast("array<double>")
    // one staged struct array per row: (code, pos-weighted contribution,
    // dequantization error). Its OWN projection, so the three aggregates
    // below reference a materialized array instead of re-deriving it
    // (higher-order functions have no common-subexpression elimination).
    val parts = transform(sequence(lit(0), lit(dim - 1)), i => {
      val x = element_at(v, i + 1)
      val mn = element_at(mnA, i + 1)
      val mx = element_at(mxA, i + 1)
      val code = when(mx > mn,
        floor(round((x - mn) * (lit(255.0) / (mx - mn)), 6) + 0.5).cast("int"))
        .otherwise(lit(0))
      val dequant = when(mx > mn, code * ((mx - mn) / lit(255.0)) + mn).otherwise(mn)
      struct(code.as("code"),
        (code.cast("long") * (i.cast("long") + 1L)).as("contrib"),
        round(abs(dequant - x), 6).as("err"))
    })
    df.select(id.as("vec_id"), parts.as("parts"))
      .select(
        col("vec_id"),
        aggregate(col("parts"), lit(0L), (acc, p) => acc + p.getField("code").cast("long"))
          .as("code_sum"),
        aggregate(col("parts"), lit(0L), (acc, p) => acc + p.getField("contrib"))
          .as("code_checksum"),
        aggregate(col("parts"), lit(0.0), (acc, p) => greatest(acc, p.getField("err")))
          .as("max_err"))
  }
}
