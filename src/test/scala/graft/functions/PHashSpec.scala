package graft.functions

import graft.SparkSpec
import graft.functions.expressions.PHash
import org.apache.spark.sql.functions._

class PHashSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation, written independently of the expression's
    * single-pass form: explicit sample → mean → threshold → pack.
    */
  private def refBands(bytes: Array[Byte], bands: Int, bits: Int): Seq[Int] = {
    val nBits = bands * bits
    if (bytes.isEmpty) return Seq.fill(bands)(0)
    val pixels = (0 until nBits).map(i => bytes((i.toLong * bytes.length / nBits).toInt) & 0xff)
    val total = pixels.map(_.toLong).sum
    (0 until bands).map { b =>
      (0 until bits).map { j =>
        if (pixels(b * bits + j).toLong * nBits > total) 1 << (bits - 1 - j) else 0
      }.sum
    }
  }

  private def hamming(a: Seq[Int], b: Seq[Int]): Int =
    a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum

  test("expression matches the reference pipeline on assorted buffers (both geometries)") {
    val rng = new scala.util.Random(62L)
    val cases = Seq(
      Array.empty[Byte],
      Array[Byte](1),
      Array.tabulate(48)(i => (i * 7 % 256).toByte),
      Array.tabulate(64)(_.toByte),
      Array.tabulate(553)(i => (rng.nextInt(256)).toByte))
    // default geometry is the 128-bit scale one (8 x 16-bit bands);
    // the legacy 64-bit 8 x 8 geometry stays pinned via explicit args
    for ((bands, bits) <- Seq((8, 16), (8, 8))) {
      val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "content")
        .select(col("id"),
          Multimodal.pHashBands(col("content"), bands, bits).as("bands"))
        .orderBy("id")
      val got = df.collect().map(_.getSeq[Int](1))
      cases.zip(got).foreach { case (bytes, out) =>
        assert(out == refBands(bytes, bands, bits), s"len=${bytes.length} ${bands}x$bits")
      }
    }
  }

  test("identical buffers hash identically; hash is length-robust to resampling") {
    // same content at different lengths via nearest-neighbour stretch:
    // doubling every byte preserves the sampled pixel sequence exactly
    val base = Array.tabulate(128)(i => ((i * 31 + 7) % 256).toByte)
    val stretched = base.flatMap(b => Array(b, b))
    val h1 = refBands(base, 8, 16)
    val h2 = refBands(stretched, 8, 16)
    assert(hamming(h1, h2) == 0, s"stretch changed the hash: $h1 vs $h2")
  }

  test("pHashNearDups equals brute force (blocking is exact for maxDist < bands)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 300 && length(col("text")) > 0)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    // plant one exact copy so the dist-0 path is exercised
    val media = docs.unionByName(
      docs.filter(col("doc_id") === 7)
        .select((col("doc_id") + 5000).as("doc_id"), col("content")))
    val got = Multimodal.pHashNearDups(media, col("doc_id"), col("content"), maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = media.select(col("doc_id"), Multimodal.pHashBands(col("content")).as("b"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val want = (for {
      (ia, ba) <- all; (ib, bb) <- all if ia < ib
      d = hamming(ba, bb) if d <= 7
    } yield (ia, ib, d)).toSet
    assert(got == want, s"got ${got.size} want ${want.size}: diff ${(got diff want) ++ (want diff got)}")
    assert(want.contains((7L, 5007L, 0)), "planted exact copy must appear at dist 0")
  }

  test("degenerate geometry rejected; wide thresholds demand more bands") {
    intercept[IllegalArgumentException] {
      Multimodal.pHashNearDups(spark.range(1).selectExpr("id", "cast('x' as binary) content"),
        col("id"), col("content"), maxDist = 8, bands = 8)
    }
  }
}
