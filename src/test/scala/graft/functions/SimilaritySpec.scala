package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine of a vector with itself is 1") {
    val self = emb.filter(col("vec_id") === 0)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("cosineTopK ranks the query vector itself first") {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val top = Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), q, k = 5)
      .collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getDouble(1) == 1.0)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("lshTopK achieves high recall vs brute force") {
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, col("vec_id"), col("embedding"), q,
        k = 10, dim = q.length, planesPerTable = 4, tables = 16)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low; exact=$exact approx=$approx")
  }

  test("nearestNeighbor is symmetric-consistent on a tiny set") {
    val nn = Similarity.nearestNeighbor(emb.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding")).collect()
    assert(nn.length == 10)
    nn.foreach { r => assert(r.getLong(0) != r.getLong(1)) }
  }

  test("ivfTopK achieves reasonable recall and full recall at nprobe=K") {
    val cents = Similarity.labelCentroids(emb, col("label"), col("embedding"))
      .collect().groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val probed = Similarity.ivfTopK(emb, col("vec_id"), col("embedding"), cents, q,
        k = 10, nprobe = 4).collect().map(_.getLong(0)).toSet
    val all = Similarity.ivfTopK(emb, col("vec_id"), col("embedding"), cents, q,
        k = 10, nprobe = cents.length).collect().map(_.getLong(0)).toSet
    assert(all == exact) // probing every bucket must equal brute force
    val recall = (exact intersect probed).size.toDouble / exact.size
    assert(recall >= 0.3, s"ivf recall $recall; exact=$exact probed=$probed")
  }

  test("deterministic hyperplanes: same seed → same planes") {
    assert(Similarity.hyperplanes(4, 8, 7L) == Similarity.hyperplanes(4, 8, 7L))
    assert(Similarity.hyperplanes(4, 8, 7L) != Similarity.hyperplanes(4, 8, 8L))
  }

  test("hardNegatives: never same-label, never self, equals the brute-force ranking") {
    import spark.implicits._
    val rng = new scala.util.Random(85L)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rng.nextGaussian().toFloat), (i % 3).toInt))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, col("vec_id"), col("embedding"),
        col("label"), col("vec_id") < 5, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val labels = vecs.map(v => v._1 -> v._3).toMap
    got.foreach { case (a, b, _) =>
      assert(a != b && labels(a) != labels(b), s"($a,$b)")
    }
    // brute force in driver code
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val nx = math.sqrt(x.map(p => p.toDouble * p.toDouble).sum)
      val ny = math.sqrt(y.map(p => p.toDouble * p.toDouble).sum)
      BigDecimal(d / (nx * ny)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (0L until 5L).flatMap { a =>
      vecs.filter(v => v._1 != a && v._3 != labels(a))
        .map(v => (a, v._1, cos(vecs(a.toInt)._2, v._2)))
        .sortBy { case (_, b, c) => (-c, b) }
        .take(4)
    }
    assert(got.toSeq == expected)
    assert(got.count(_._1 == 0L) == 4)
  }
}
