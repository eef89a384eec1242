package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the highest occurrence count of any
  * element in a string array (`pairs = false`), or of any ADJACENT PAIR
  * (`pairs = true` — word bigrams without materializing joined strings).
  *
  * Semantics match the Column formulation it replaces
  * (`aggregate(array_sort(arr), …)` run-scan, and for bigrams
  * `transform`+`concat_ws(" ")` first): equality of (a, b) pairs is
  * equality of the `"a b"` joined string because whitespace-split tokens
  * cannot contain spaces; an empty array (or <2 tokens with `pairs`)
  * counts 0. Only the grouping matters for run counting, so the sort
  * order itself needs no cross-engine contract.
  *
  * Why an expression: `array_sort`/`aggregate`/`transform` are all
  * CodegenFallback — three interpreted passes with per-element lambda
  * allocation per document. This sorts an index array and scans runs in
  * one compiled pass, inside whole-stage codegen.
  */
case class MaxRunCount(child: Expression, pairs: Boolean) extends UnaryExpression {

  override def prettyName: String = "max_run_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_run_count needs an array<string> input, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    RunOps.maxRun(v.asInstanceOf[ArrayData], pairs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RunOps.maxRun($c, $pairs)")

  override protected def withNewChildInternal(newChild: Expression): MaxRunCount =
    copy(child = newChild)
}

object RunOps {

  /** Called from generated code: index sort + one run scan. */
  def maxRun(a: ArrayData, pairs: Boolean): Int = {
    val n = a.numElements()
    val m = if (pairs) n - 1 else n
    if (m <= 0) return 0
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = a.getUTF8String(i); i += 1 }
    val idx = new Array[Integer](m)
    i = 0
    while (i < m) { idx(i) = Integer.valueOf(i); i += 1 }
    val cmp = new java.util.Comparator[Integer] {
      def compare(x: Integer, y: Integer): Int = {
        val c1 = toks(x).compareTo(toks(y))
        if (c1 != 0 || !pairs) c1 else toks(x + 1).compareTo(toks(y + 1))
      }
    }
    java.util.Arrays.sort(idx, cmp)
    var best = 1
    var run = 1
    i = 1
    while (i < m) {
      if (cmp.compare(idx(i - 1), idx(i)) == 0) {
        run += 1
        if (run > best) best = run
      } else run = 1
      i += 1
    }
    best
  }

  /** Column wrappers. */
  def maxRunCol(arr: Column): Column =
    CatalystBridge.column(MaxRunCount(CatalystBridge.expression(arr), pairs = false))

  def maxBigramRunCol(toks: Column): Column =
    CatalystBridge.column(MaxRunCount(CatalystBridge.expression(toks), pairs = true))
}
