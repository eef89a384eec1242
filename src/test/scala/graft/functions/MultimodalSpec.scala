package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("feature extraction is deterministic over partitioned batches") {
    val f1 = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 100))
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 100).repartition(7))
      .collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq) // partitioning must not change results
    assert(f1.forall(r => r.brightness >= 0 && r.brightness <= 255))
    assert(f1.forall(r => r.n_bytes >= 64 && r.n_bytes < 128))
  }

  test("resize plan computes scale and keeps partition count") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 50)).toDF()
    val resized = Multimodal.resizePlan(feats, targetWidth = 32, shufflePartitions = 4)
    assert(resized.rdd.getNumPartitions == 4)
    val r = resized.filter(col("width") === 16).select("scale", "out_height").head()
    assert(r.getDouble(0) == 2.0)
  }

  test("frame sampling explodes a deterministic stride sequence") {
    val media = Multimodal.syntheticMedia(spark, 3).toDF()
    val frames = Multimodal.frameSamplePlan(media, nFrames = 10, stride = 3)
    assert(frames.count() == 3 * 4) // frames 0,3,6,9 per media row
  }

  test("a REAL javax.imageio codec drops into the same operator (no operator change)") {
    import spark.implicits._
    // real encoded images, built in-memory: PNG is lossless so decoded
    // dimensions and mean gray level are exact knowns
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val white = png(3, 2, 0xffffff)            // mean gray 255
    val slate = png(5, 4, (10 << 16) | (20 << 8) | 30) // mean gray (10+20+30)/3 = 20
    // metadata deliberately WRONG (0×0): the real decoder must recover
    // true dimensions from the bytes, proving it actually decodes
    val media = Seq(
      Multimodal.MediaRow(1L, "image", white, 0, 0),
      Multimodal.MediaRow(2L, "image", slate, 0, 0)).toDS().repartition(2)
    val got = Multimodal.extractFeatures(media, Multimodal.imageIoDecoder)
      .collect().sortBy(_.media_id)
    assert(got(0).width == 3 && got(0).height == 2 && got(0).brightness == 255.0)
    assert(got(1).width == 5 && got(1).height == 4 && got(1).brightness == 20.0)
    // raw-byte features still come from the operator, not the decoder
    val crc = new java.util.zip.CRC32(); crc.update(white)
    assert(got(0).n_bytes == white.length && got(0).checksum == crc.getValue)
    // a JPEG payload decodes through the same seam (built-in JDK codec)
    val jimg = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) jimg.setRGB(x, y, 0x808080)
    val jbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(jimg, "jpg", jbos))
    val jgot = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(3L, "image", jbos.toByteArray, 0, 0)).toDS(),
      Multimodal.imageIoDecoder).head()
    assert(jgot.width == 4 && jgot.height == 4)
    assert(math.abs(jgot.brightness - 128.0) < 4.0) // JPEG is lossy; gray stays gray±quant
    // and a non-image payload fails LOUDLY with the offending id
    val bad = Seq(Multimodal.MediaRow(9L, "image", Array[Byte](1, 2, 3), 0, 0)).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(bad, Multimodal.imageIoDecoder).collect()
    }
    assert(ex.getMessage.contains("media_id=9") ||
      Option(ex.getCause).exists(_.getMessage.contains("media_id=9")))
  }
}
