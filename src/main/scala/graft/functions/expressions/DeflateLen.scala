package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE-compressed byte length of a
  * string (zlib level 6, raw deflate).
  *
  * The compression ratio `deflated/raw` is the classic
  * information-density quality signal (low ratio = repetitive
  * machine-generated or template text; near-1 = high-entropy noise —
  * both ends are what quality rules in large-corpus pipelines cut). A
  * UDF here would box every row; this runs the deflater inline in
  * generated code over the UTF-8 bytes the column already holds.
  *
  * Deterministic for a fixed zlib level within a JVM lineup, but NOT a
  * cross-engine portable quantity — consumers are rows-only checked with
  * spec goldens, and the emitted columns are exact integers (no float
  * rendering concerns).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.DeflateLen.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  /** Called from generated code. Counts output bytes without keeping them. */
  def deflatedLength(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column wrapper. */
  def deflateLenCol(c: Column): Column =
    CatalystBridge.column(DeflateLen(CatalystBridge.expression(c)))
}
