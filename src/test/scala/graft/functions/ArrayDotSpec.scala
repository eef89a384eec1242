package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayDotSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the zip_with+aggregate formulation on float arrays") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rng.nextFloat() * 2 - 1),
      Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).collect().map(_.getDouble(0))
    // exact equality: same operation order in IEEE double
    assert(got.toSeq == want.toSeq)
  }

  test("double arrays and mixed float/double work; nulls propagate") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0f, 5.0f, 6.0f))).toDF("d", "f")
    assert(df.select(Similarity.dot(col("d"), col("f"))).head().getDouble(0) == 32.0)
    val withNull = df.select(Similarity.dot(lit(null).cast("array<double>"), col("d")))
    assert(withNull.head().isNullAt(0))
  }

  test("length mismatch fails loudly") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }
}
