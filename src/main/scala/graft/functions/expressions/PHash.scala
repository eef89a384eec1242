package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression: perceptual image hash (the average-hash /
  * aHash member of the pHash family) over an opaque `binary` media
  * column, emitted as `bands` integer band values for exact
  * hamming-radius blocking (multi-index hashing, Norouzi et al., CVPR'12:
  * any pair within hamming distance t shares at least one of m bands
  * whenever t < m — pigeonhole — so a band-equality join is an EXACT
  * candidate generator, never a recall trade-off).
  *
  * Pipeline per row, all O(len) single-pass:
  *   1. "decode": the byte buffer is treated as a 1-D grayscale pixel
  *      strip. This is the clearly-marked STUB step — a real deployment
  *      decodes JPEG/PNG here (the codec is absent in this environment);
  *      everything downstream — resize, threshold, banding, blocking —
  *      is the real machinery and is what the oracle checks.
  *   2. "resize": nearest-neighbour sample to exactly `bands*bitsPerBand`
  *      pixels (`pixel_i = bytes[(i*n)/nBits]`), the analogue of pHash's
  *      resize to a fixed grid; this is what makes the hash robust to
  *      length changes.
  *   3. threshold: bit_i = 1 iff pixel_i > mean(pixels), compared as
  *      `pixel_i * nBits > sum` so the test is integer-exact (no division).
  *   4. band: pack `bitsPerBand` consecutive bits per band value.
  *
  * Band WIDTH is the scale dial of the downstream blocking join: 8-bit
  * bands give only 256 distinct bucket values, so the exact-pigeonhole
  * candidate generator degenerates quadratically in n/256 per band as
  * the corpus grows (measured 13.9× cost at 4× data in SCALE.md r14).
  * The default geometry is therefore a 128-bit code banded at 16 bits
  * (65 536 values per band): per-band candidate mass drops ~256× and
  * the generator stays EXACT for maxDist < bands — same pigeonhole,
  * same verify.
  *
  * Empty input yields all-zero bands (a deterministic hash for empty
  * media, matching the oracle's coalesce).
  */
case class PHashBands(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 30,
    s"invalid band geometry ($bands x $bitsPerBand)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "phash_bands"

  override protected def nullSafeEval(input: Any): Any =
    PHash.compute(input.asInstanceOf[Array[Byte]], bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PHash.compute($c, $bands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): PHashBands =
    copy(child = newChild)
}

object PHash {

  /** Single pass: sample `bands*bitsPerBand` pixels, mean-threshold,
    * pack band ints. Called from generated code — static,
    * allocation-light.
    */
  def compute(bytes: Array[Byte], bands: Int, bitsPerBand: Int): ArrayData = {
    val nBits = bands * bitsPerBand
    val out = new Array[Int](bands)
    val n = bytes.length
    if (n == 0) return new GenericArrayData(out)

    val pixels = new Array[Int](nBits)
    var i = 0
    var total = 0L
    while (i < nBits) {
      val p = bytes((i.toLong * n / nBits).toInt) & 0xff
      pixels(i) = p
      total += p
      i += 1
    }
    var b = 0
    while (b < bands) {
      var v = 0
      var j = 0
      while (j < bitsPerBand) {
        // pixel > mean  ⟺  pixel * nBits > total (integer-exact)
        if (pixels(b * bitsPerBand + j).toLong * nBits > total)
          v |= 1 << (bitsPerBand - 1 - j)
        j += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  def pHashBandsCol(c: Column, bands: Int = 8, bitsPerBand: Int = 16): Column =
    CatalystBridge.column(PHashBands(CatalystBridge.expression(c), bands, bitsPerBand))
}
