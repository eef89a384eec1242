package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated label clusters in dim 8 → M=2 subspaces of 4
  private def fixture = Seq(
    (0L, Seq(0.1f, 0.2f, 0.1f, 0.2f, 0.9f, 0.8f, 0.9f, 0.8f), 0),
    (1L, Seq(0.2f, 0.1f, 0.2f, 0.1f, 0.8f, 0.9f, 0.8f, 0.9f), 0),
    (2L, Seq(0.9f, 0.8f, 0.9f, 0.8f, 0.1f, 0.2f, 0.1f, 0.2f), 1),
    (3L, Seq(0.8f, 0.9f, 0.8f, 0.9f, 0.2f, 0.1f, 0.2f, 0.1f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("trainCodebooks: M x K x dim/M shape, codes are the sorted labels") {
    val books = Pq.trainCodebooks(fixture, col("label"), col("embedding"), 2)
    assert(books.length == 2)
    assert(books.forall(_.map(_._1) == Seq(0, 1)))
    assert(books.forall(_.forall(_._2.length == 4)))
    // subspace-0 centroid of label 0 is the mean of its first-4 dims
    assert(books(0).head._2 == Seq(0.15, 0.15, 0.15, 0.15))
  }

  test("encode: vectors take their own cluster's code in every subspace") {
    val books = Pq.trainCodebooks(fixture, col("label"), col("embedding"), 2)
    val codes = Pq.encode(fixture, col("vec_id"), col("embedding"), books)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(codes(0L) == ((0, 0)) && codes(1L) == ((0, 0)))
    assert(codes(2L) == ((1, 1)) && codes(3L) == ((1, 1)))
  }

  test("adcTopK equals exact distance to the RECONSTRUCTION, and ranks clusters correctly") {
    val books = Pq.trainCodebooks(fixture, col("label"), col("embedding"), 2)
    val query = Seq(0.15, 0.15, 0.15, 0.15, 0.85, 0.85, 0.85, 0.85) // label-0 shaped
    val out = Pq.adcTopK(fixture, col("vec_id"), col("embedding"), books, query, k = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // label-0 vectors (codes "0,0") must outrank label-1 vectors
    assert(out.take(2).map(_._2).forall(_ == "0,0"))
    assert(out.drop(2).map(_._2).forall(_ == "1,1"))
    // ADC is the distance to the reconstruction: recompute in plain Scala
    def sq(a: Seq[Double], b: Seq[Double]) = {
      val ss = a.map(x => x * x).sum
      val sc = a.zip(b).map { case (x, y) => x * y }.sum
      val cc = b.map(x => x * x).sum
      BigDecimal(ss - 2.0 * sc + cc)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCode = out.map { case (_, codes, adc) =>
      val cs = codes.split(",").map(_.toInt)
      val expected = BigDecimal(
        sq(query.slice(0, 4), books(0).find(_._1 == cs(0)).get._2) +
        sq(query.slice(4, 8), books(1).find(_._1 == cs(1)).get._2))
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      (adc, expected)
    }
    byCode.foreach { case (adc, exp) => assert(math.abs(adc - exp) < 1e-9) }
  }

  test("encode and ADC are partition-invariant") {
    val books = Pq.trainCodebooks(fixture, col("label"), col("embedding"), 2)
    val query = Seq(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5)
    def run(df: org.apache.spark.sql.DataFrame) =
      Pq.adcTopK(df, col("vec_id"), col("embedding"), books, query, k = 4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(run(fixture) == run(fixture.repartition(7)))
  }
}
