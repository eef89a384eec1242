package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the audio/video stub-decode pipeline.
  * As with [[PHashBands]], the DECODE step is the clearly-marked stub
  * (bytes stand in for PCM samples / frame lumas — real codecs are absent
  * in this environment); the windowing, energy, thresholding, and
  * delta-detection machinery is real, integer-exact, and oracle-checked.
  */

/** Voice-activity trim over a PCM-byte column: non-overlapping frames of
  * `frameLen` samples; frame energy = Σ (s−128)², with `s` the unsigned
  * byte. A frame is ACTIVE when its energy exceeds `threshold`. Output
  * struct: `(n_frames, n_active, first_active, last_active)` with frame
  * indices, `first_active = last_active = -1` for all-silent input. The
  * trim byte range follows as `first_active*frameLen ..
  * min((last_active+1)*frameLen, n)`. One O(n) pass per row.
  */
case class AudioTrimStats(child: Expression, frameLen: Int, threshold: Long)
    extends UnaryExpression {
  require(frameLen >= 1, s"frameLen must be positive: $frameLen")

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_active", IntegerType, nullable = false),
    StructField("first_active", IntegerType, nullable = false),
    StructField("last_active", IntegerType, nullable = false)))
  override def prettyName: String = "audio_trim_stats"

  override protected def nullSafeEval(input: Any): Any =
    Media.audioTrim(input.asInstanceOf[Array[Byte]], frameLen, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Media.audioTrim($c, $frameLen, ${threshold}L)")

  override protected def withNewChildInternal(newChild: Expression): AudioTrimStats =
    copy(child = newChild)
}

/** Scene-cut detection over a video-byte column: consecutive complete
  * `frameLen`-byte blocks are frames (a trailing partial frame is
  * dropped — unequal lengths would make the mean comparison inexact);
  * a cut is flagged at frame i ≥ 1 when |sum_i − sum_{i−1}| >
  * `meanDelta * frameLen` — the integer cross-multiplied form of
  * "mean luma jumped by more than meanDelta". Returns the cut frame
  * indices, ascending. One O(n) pass per row.
  */
case class SceneCuts(child: Expression, frameLen: Int, meanDelta: Int)
    extends UnaryExpression {
  require(frameLen >= 1 && meanDelta >= 0,
    s"invalid scene-cut params ($frameLen, $meanDelta)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "scene_cuts"

  override protected def nullSafeEval(input: Any): Any =
    Media.sceneCuts(input.asInstanceOf[Array[Byte]], frameLen, meanDelta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Media.sceneCuts($c, $frameLen, $meanDelta)")

  override protected def withNewChildInternal(newChild: Expression): SceneCuts =
    copy(child = newChild)
}

object Media {

  def audioTrim(bytes: Array[Byte], frameLen: Int, threshold: Long): InternalRow = {
    val n = bytes.length
    val nFrames = n / frameLen + (if (n % frameLen > 0) 1 else 0)
    var nActive = 0
    var first = -1
    var last = -1
    var f = 0
    while (f < nFrames) {
      val start = f * frameLen
      val end = math.min(start + frameLen, n)
      var e = 0L
      var i = start
      while (i < end) {
        val d = (bytes(i) & 0xff) - 128
        e += d.toLong * d
        i += 1
      }
      if (e > threshold) {
        nActive += 1
        if (first < 0) first = f
        last = f
      }
      f += 1
    }
    InternalRow(nFrames, nActive, first, last)
  }

  def sceneCuts(bytes: Array[Byte], frameLen: Int, meanDelta: Int): ArrayData = {
    val nFrames = bytes.length / frameLen // complete frames only
    if (nFrames < 2) return new GenericArrayData(Array.empty[Int])
    val bound = meanDelta.toLong * frameLen
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var prev = 0L
    var f = 0
    while (f < nFrames) {
      var s = 0L
      var i = f * frameLen
      val end = i + frameLen
      while (i < end) { s += bytes(i) & 0xff; i += 1 }
      if (f >= 1 && math.abs(s - prev) > bound) out += f
      prev = s
      f += 1
    }
    new GenericArrayData(out.toArray)
  }

  def audioTrimStatsCol(c: Column, frameLen: Int, threshold: Long): Column =
    CatalystBridge.column(AudioTrimStats(CatalystBridge.expression(c), frameLen, threshold))

  def sceneCutsCol(c: Column, frameLen: Int, meanDelta: Int): Column =
    CatalystBridge.column(SceneCuts(CatalystBridge.expression(c), frameLen, meanDelta))
}
