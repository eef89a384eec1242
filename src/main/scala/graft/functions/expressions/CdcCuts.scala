package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunk CUT POINTS of a
  * string — `[1, b₁+1, …, n+1]` (1-based codepoint positions) where each
  * bᵢ is a gram-end position `k ≤ p ≤ n−1` whose ending k-gram hashes to
  * ≡ 0 (mod divisor).
  *
  * The hash replicates the engine's portable md5-prefix idiom EXACTLY
  * (`conv(substring(md5(gram),1,7),16,10)` — the first 28 bits of the
  * MD5), so the cuts are bit-identical to the array-expression
  * formulation and to the DuckDB oracle. The higher-order-function form
  * evaluated an interpreted expression tree per character position
  * (CodegenFallback, no CSE) — this is one JVM loop per row with a
  * reused MessageDigest, called from generated code, keeping the scan
  * inside whole-stage codegen (same motivation as [[WinnowingFp]]).
  *
  * Positions count CODEPOINTS, matching `Column.substr`/`length`
  * semantics on supplementary characters.
  */
case class CdcCuts(child: Expression, k: Int, divisor: Int) extends UnaryExpression {
  require(k >= 1 && divisor >= 1, s"k and divisor must be positive (k=$k, divisor=$divisor)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String], k, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.CdcCuts.compute($c, $k, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {

  /** Called from generated code: one pass over the row's codepoints. */
  def compute(s: UTF8String, k: Int, divisor: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    // codepoint index -> UTF-16 offset (offs(n) = end of string)
    val offs = new Array[Int](n + 1)
    var ci = 0
    var o = 0
    while (ci < n) { offs(ci) = o; o = str.offsetByCodePoints(o, 1); ci += 1 }
    offs(n) = str.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new java.util.ArrayList[Int]
    buf.add(1)
    var p = k // 1-based gram END position; cuts allowed at k..n-1
    while (p <= n - 1) {
      md.reset()
      val gram = str.substring(offs(p - k), offs(p))
      val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 7 hex chars of the md5 = top 28 bits, as the conv() idiom reads them
      val v = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
      if (v % divisor == 0) buf.add(p + 1)
      p += 1
    }
    buf.add(n + 1)
    val out = new Array[Int](buf.size)
    var i = 0
    while (i < out.length) { out(i) = buf.get(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def cutsCol(c: Column, k: Int, divisor: Int): Column =
    CatalystBridge.column(CdcCuts(CatalystBridge.expression(c), k, divisor))
}
