package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the cross-engine determinism contract of the clustering ops:
  * the centroid mean must be accumulation-order independent (integer-
  * scaled exact sums), so the same data under different partitionings
  * yields bit-identical 4-dp centroids — the property whose absence
  * made p30 flap against its DuckDB oracle.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf(partitions: Int) = {
    // values chosen to sit near a 4-dp rounding boundary once averaged:
    // plain double avg() can land on either side depending on order
    val rows = (0 until 64).map { i =>
      (i.toLong, Seq(0.1 + i * 1e-7, -0.05 + (63 - i) * 1e-7, 1.0 / (i + 3)))
    }
    rows.toDF("vec_id", "embedding").repartition(partitions, col("vec_id"))
  }

  test("sphericalKMeans centroids are identical across partitionings") {
    val init = (0 until 4).map(k => k -> Seq(0.1 * k + 0.01, -0.05, 0.3)).toSeq
    def run(parts: Int) =
      Clustering.sphericalKMeans(mkDf(parts), col("vec_id"), col("embedding"), init, iters = 2)
        .orderBy("cluster", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    val a = run(1)
    val b = run(7)
    val c = run(32)
    assert(a == b, "centroids differ between 1 and 7 partitions")
    assert(a == c, "centroids differ between 1 and 32 partitions")
    assert(a.nonEmpty && a.forall { case (_, _, v) =>
      (math.abs(v * 10000) - math.round(math.abs(v * 10000))).abs < 1e-9
    }, "centroid components must be 4-dp rounded")
  }

  test("sphericalKMeans normalizes IEEE negative zero in centroids") {
    // a tiny negative mean rounds to zero at 4 dp; engines disagree on
    // whether round() keeps the sign bit (DuckDB: -0.0, Spark: 0.0),
    // which flipped p30's driver hash for three rounds. The centroid
    // expression's trailing `+ 0.0` must yield POSITIVE zero.
    val df = Seq((0L, Seq(-1e-9, 1.0)), (1L, Seq(-1e-9, 1.0)))
      .toDF("vec_id", "embedding")
    val out = Clustering.sphericalKMeans(df, col("vec_id"), col("embedding"),
        init = Seq(0 -> Seq(0.0, 1.0)), iters = 1)
      .orderBy("cluster", "pos").collect()
    val zeroComp = out.find(r => r.getInt(1) == 0).get.getDouble(2)
    assert(zeroComp == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(zeroComp) == 0L,
      s"centroid zero must be +0.0, got raw bits of $zeroComp")
  }

  test("dimMinMax: empty input, null vectors, and ragged lengths") {
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(Clustering.dimMinMax(empty, col("v")) == Seq.empty)

    val withNull = Seq((0L, Some(Seq(1.0, 2.0))), (1L, None), (2L, Some(Seq(-1.0, 5.0))))
      .toDF("id", "v")
    assert(Clustering.dimMinMax(withNull, col("v")) == Seq((-1.0, 1.0), (2.0, 5.0)))
    assert(Clustering.dimMinMax(withNull.filter(col("v").isNull), col("v")) == Seq.empty)

    // ragged: position 2's bounds come from the only row that has it,
    // regardless of partitioning
    val ragged = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(0.0, 3.0, 7.0))).toDF("id", "v")
    val expect = Seq((0.0, 1.0), (2.0, 3.0), (7.0, 7.0))
    assert(Clustering.dimMinMax(ragged, col("v")) == expect)
    assert(Clustering.dimMinMax(ragged.repartition(5), col("v")) == expect)
  }

  test("assignClusters breaks cosine ties toward the smaller cluster id") {
    val df = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    // two identical centroids → identical cosine → smaller id wins
    val out = Clustering.assignClusters(df, col("vec_id"), col("embedding"),
      Seq(3 -> Seq(1.0, 0.0), 7 -> Seq(1.0, 0.0))).collect()
    assert(out.head.getAs[Int]("cluster") == 3)
  }

  test("quantizeVector matches the executor code formula (QuantizeOps twin)") {
    val bounds = Seq((0.0, 1.0), (-2.0, 2.0), (5.0, 5.0))
    // constant dim → code 0; endpoints → 0 and 255; midpoint rounds up
    assert(Clustering.quantizeVector(Seq(0.0, -2.0, 5.0), bounds) == Seq(0, 0, 0))
    assert(Clustering.quantizeVector(Seq(1.0, 2.0, 5.0), bounds) == Seq(255, 255, 0))
    assert(Clustering.quantizeVector(Seq(0.5, 0.0, 5.0), bounds) == Seq(128, 128, 0))
  }

  test("quantizedDotTopK ranks by the exact integer code dot; ties break by id") {
    val df = Seq(
      (0L, Seq(1.0, 0.0)),   // codes (255, 0)   → qdot 255·255 = 65025
      (1L, Seq(0.0, 1.0)),   // codes (0, 255)   → qdot 0
      (2L, Seq(0.5, 0.5)),   // codes (128, 128) → qdot 128·255 = 32640
      (3L, Seq(1.0, 1.0))    // codes (255, 255) → qdot 65025 — ties id 0
    ).toDF("vec_id", "embedding")
    val bounds = Seq((0.0, 1.0), (0.0, 1.0))
    val qCodes = Clustering.quantizeVector(Seq(1.0, 0.0), bounds) // (255, 0)
    val got = Clustering.quantizedDotTopK(df, col("vec_id"), col("embedding"),
        bounds, qCodes, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 65025L), (3L, 65025L), (2L, 32640L)))
  }

  test("quantizedDotTopK drops zero-code query positions and validates shapes") {
    val df = Seq((0L, Seq(0.3, 0.7))).toDF("vec_id", "embedding")
    val bounds = Seq((0.0, 1.0), (0.0, 1.0))
    // all-zero query codes → score collapses to the constant 0
    val z = Clustering.quantizedDotTopK(df, col("vec_id"), col("embedding"),
      bounds, Seq(0, 0), k = 1).collect()
    assert(z.head.getLong(1) == 0L)
    intercept[IllegalArgumentException] {
      Clustering.quantizedDotTopK(df, col("vec_id"), col("embedding"),
        bounds, Seq(1), k = 1)
    }
    intercept[IllegalArgumentException] {
      Clustering.quantizedDotTopK(df, col("vec_id"), col("embedding"),
        bounds, Seq(1, 1), k = 0)
    }
  }
}
