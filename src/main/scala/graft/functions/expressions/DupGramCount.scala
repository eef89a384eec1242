package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: how many n-gram POSITIONS in a token
  * array belong to an n-gram that occurs two or more times in the same
  * array. `dup / (len - n + 1)` is the "fraction of duplicated n-grams"
  * repetition signal from the published quality-filter rule sets (the
  * within-document repetition family that [[MaxRunCount]]'s top-gram
  * fraction begins).
  *
  * Same design as [[MaxRunCount]]: grams are compared as their joined
  * `"a b …"` strings conceptually (whitespace-split tokens cannot
  * contain spaces, so sequence equality ⇔ joined-string equality), but
  * the implementation sorts an index array with a lexicographic n-token
  * comparator and sums run lengths ≥ 2 in one compiled pass — no gram
  * strings are ever materialized, and the whole thing stays inside
  * whole-stage codegen (the `transform`+`concat_ws`+`array_distinct`
  * Column form is three interpreted CodegenFallback passes). Fewer than
  * n tokens → 0 positions, 0 duplicates.
  */
case class DupGramCount(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "DupGramCount needs n >= 1")

  override def prettyName: String = "dup_gram_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dup_gram_count needs an array<string> input, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    DupGramOps.dupCount(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.DupGramOps.dupCount($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DupGramCount =
    copy(child = newChild)
}

object DupGramOps {

  /** Called from generated code: index sort by n-token lexicographic
    * order, then one run scan summing the length of every run ≥ 2.
    */
  def dupCount(a: ArrayData, n: Int): Int = {
    val tot = a.numElements()
    val m = tot - n + 1
    if (m <= 1) return 0
    val toks = new Array[UTF8String](tot)
    var i = 0
    while (i < tot) { toks(i) = a.getUTF8String(i); i += 1 }
    val idx = new Array[Integer](m)
    i = 0
    while (i < m) { idx(i) = Integer.valueOf(i); i += 1 }
    val cmp = new java.util.Comparator[Integer] {
      def compare(x: Integer, y: Integer): Int = {
        var j = 0
        while (j < n) {
          val c = toks(x + j).compareTo(toks(y + j))
          if (c != 0) return c
          j += 1
        }
        0
      }
    }
    java.util.Arrays.sort(idx, cmp)
    var dup = 0
    var run = 1
    i = 1
    while (i < m) {
      if (cmp.compare(idx(i - 1), idx(i)) == 0) run += 1
      else {
        if (run >= 2) dup += run
        run = 1
      }
      i += 1
    }
    if (run >= 2) dup += run
    dup
  }

  /** Column wrapper over a token-array column. */
  def dupGramCountCol(toks: Column, n: Int): Column =
    CatalystBridge.column(DupGramCount(CatalystBridge.expression(toks), n))
}
