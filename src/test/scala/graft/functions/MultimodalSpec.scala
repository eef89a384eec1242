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
}
