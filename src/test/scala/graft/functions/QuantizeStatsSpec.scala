package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The native `quantize_stats` expression must be bit-identical to the
  * Column formulation it replaced (transform + three aggregate folds) —
  * the DuckDB oracle (p31) was validated against that form.
  */
class QuantizeStatsSpec extends SparkSpec {
  import spark.implicits._

  /** The ORIGINAL CodegenFallback formulation, kept here as the
    * reference twin.
    */
  private def columnFormQuantize(df: DataFrame, id: Column, vec: Column,
                                 bounds: Seq[(Double, Double)]): DataFrame = {
    val dim = bounds.length
    val mnA = array(bounds.map(b => lit(b._1)): _*)
    val mxA = array(bounds.map(b => lit(b._2)): _*)
    val v = vec.cast("array<double>")
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

  // awkward values on purpose: rounding-boundary-ish magnitudes, a
  // negative-range dim, a constant dim (mx == mn), zeros
  private def mkData = {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Seq(
        i * 0.0031 - 0.3, math.sin(i * 0.7) * 2.5, 42.0,
        if (i % 3 == 0) 0.0 else 1.0 / (i + 1), -5.0 + (i % 17) * 0.625))
    }
    vecs.toDF("vec_id", "embedding")
  }

  test("native expression equals the Column formulation bit-for-bit") {
    val df = mkData
    val bounds = Clustering.dimMinMax(df, col("embedding"))
    val native = Clustering.scalarQuantize(df, col("vec_id"), col("embedding"), bounds)
      .orderBy("vec_id").collect()
    val reference = columnFormQuantize(df, col("vec_id"), col("embedding"), bounds)
      .orderBy("vec_id").collect()
    assert(native.length == reference.length)
    native.zip(reference).foreach { case (n, r) =>
      assert(n.getLong(1) == r.getLong(1), s"code_sum differs for vec ${n.getLong(0)}")
      assert(n.getLong(2) == r.getLong(2), s"code_checksum differs for vec ${n.getLong(0)}")
      assert(n.getDouble(3) == r.getDouble(3), s"max_err differs for vec ${n.getLong(0)}")
    }
  }

  test("float arrays quantize without an explicit cast") {
    val f = Seq((0L, Seq(0.5f, 1.5f)), (1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = Clustering.scalarQuantize(f, col("vec_id"), col("embedding"),
      Seq((0.5, 1.0), (1.5, 2.0))).orderBy("vec_id").collect()
    assert(out(0).getLong(1) == 0L)          // both dims at their minimum
    assert(out(1).getLong(1) == 510L)        // both dims at their maximum
    assert(out(0).getDouble(3) == 0.0 && out(1).getDouble(3) == 0.0)
  }

  test("the expression stays inside whole-stage codegen") {
    // parquet-backed (a local relation is constant-folded away entirely)
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = Clustering.scalarQuantize(df, col("vec_id"), col("embedding"),
      Seq.fill(64)((0.0, 1.0))).queryExecution.executedPlan.toString
    assert(p.contains("quantize_stats"), p)
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p)
  }

  test("length mismatch fails loudly, not by truncation") {
    val df = Seq((0L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Clustering.scalarQuantize(df, col("vec_id"), col("embedding"),
        Seq((0.0, 1.0), (0.0, 1.0))).collect()
    }
    assert(ex.getMessage != null)
  }
}
