package graft.functions

import graft.SparkSpec
import graft.functions.expressions.Media
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference for the trim stats. */
  private def refTrim(bytes: Array[Byte], frame: Int, thr: Long): (Int, Int, Int, Int) = {
    val frames = bytes.grouped(frame).toSeq
    val energies = frames.map(_.map(b => { val d = (b & 0xff) - 128; d.toLong * d }).sum)
    val active = energies.zipWithIndex.filter(_._1 > thr).map(_._2)
    (frames.size, active.size, active.headOption.getOrElse(-1), active.lastOption.getOrElse(-1))
  }

  private def refCuts(bytes: Array[Byte], frame: Int, delta: Int): Seq[Int] = {
    val sums = bytes.grouped(frame).filter(_.length == frame)
      .map(_.map(b => (b & 0xff).toLong).sum).toSeq
    (1 until sums.size).filter(i => math.abs(sums(i) - sums(i - 1)) > delta.toLong * frame)
  }

  test("audio trim matches the reference on assorted buffers, incl. all-silent and tail frames") {
    val rng = new scala.util.Random(65L)
    val cases = Seq(
      Array.fill(96)(128.toByte),                      // all-silent (energy 0)
      Array.tabulate(100)(i => (i % 256).toByte),      // partial tail frame
      Array.tabulate(64)(_ => (rng.nextInt(256)).toByte),
      Array[Byte](0),                                  // single sample, loud
      "hello world this is a tiny pcm-ish buffer with spaces".getBytes("UTF-8"))
    val got = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(col("id"), Media.audioTrimStatsCol(col("content"), 32, 60000L).as("t"))
      .orderBy("id")
      .select(col("t.n_frames"), col("t.n_active"), col("t.first_active"), col("t.last_active"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    cases.zip(got).foreach { case (bytes, g) =>
      assert(g == refTrim(bytes, 32, 60000L), s"len=${bytes.length}")
    }
    assert(got(0) == ((3, 0, -1, -1)))  // silent → -1 markers
  }

  test("scene cuts match the reference; partial trailing frame never participates") {
    val rng = new scala.util.Random(66L)
    val quiet = Array.fill(64)(100.toByte)
    val loud = Array.fill(64)(200.toByte)
    val jump = quiet ++ loud                            // one cut at frame 2
    val cases = Seq(
      jump,
      jump ++ Array.fill(10)(0.toByte),                 // partial tail ignored
      Array.fill(31)(5.toByte),                         // < 1 complete frame
      Array.tabulate(500)(_ => (rng.nextInt(256)).toByte))
    val got = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(col("id"), Media.sceneCutsCol(col("content"), 32, 6).as("cuts"))
      .orderBy("id")
      .collect().map(_.getSeq[Int](1))
    cases.zip(got).foreach { case (bytes, g) =>
      assert(g == refCuts(bytes, 32, 6), s"len=${bytes.length}")
    }
    assert(got(0) == Seq(2) && got(1) == Seq(2))
  }

  test("frame samples: shots between cuts, middle frame as representative, byte slice aligned") {
    val quiet = Array.fill(64)(100.toByte)
    val loud = Array.fill(64)(200.toByte)
    val cases = Seq(
      (1L, quiet ++ loud),                      // nf=4, cut at 2 → shots [0,2),[2,4)
      (2L, Array.fill(40)(9.toByte)),           // nf=1, no cuts → one shot [0,1)
      (3L, Array.fill(20)(9.toByte)))           // nf=0 → dropped
    val got = graft.functions.Multimodal.frameSamples(
        cases.toDF("doc_id", "content"), col("doc_id"), col("content"), 32, 6)
      .orderBy("doc_id", "shot_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6))).toSeq
    assert(got == Seq(
      (1L, 0, 0, 2, 0, 0, 32),
      (1L, 1, 2, 4, 2, 64, 32),
      (2L, 0, 0, 1, 0, 0, 32)), got.toString)
  }

  test("chunk dedup signals: planted shared passage is counted, unique chunks are not") {
    val shared = (1 to 32).map(i => s"tok$i").mkString(" ")   // exactly one chunk
    val docs = Seq(
      (1L, shared + " " + (1 to 32).map(i => s"uniq1_$i").mkString(" ")),
      (2L, shared + " " + (1 to 32).map(i => s"uniq2_$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"solo_$i").mkString(" ")),
      (4L, "   ")                                              // blank → dropped
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedupSignals(docs, col("doc_id"), col("text"), chunkLen = 32)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // docs 1/2: 2 chunks each, the shared one counted once per doc; doc 3: 2 unique chunks
    assert(got == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)), got.toString)
  }

  test("thumbnail resize matches the per-byte reference on the synthetic corpus") {
    val got = Multimodal.resizeThumbnails(Multimodal.syntheticMedia(spark, 50))
      .collect().map(t => t.media_id -> (t.thumb_len, t.thumb_sum)).toMap
    (0L until 50L).foreach { i =>
      val len = 64 + (i % 64).toInt
      val bytes = Array.tabulate(len)(j => ((i * 31 + j * 7) % 256).toInt)
      val stride = math.max(len / 16, 1)
      val sampled = (0 until 16).takeWhile(_ * stride < len).map(j => bytes(j * stride))
      assert(got(i) == ((sampled.size, sampled.map(_.toLong).sum)), s"media $i")
    }
  }
}
