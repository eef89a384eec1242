package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric arrays in
  * DOUBLE precision, accumulating left-to-right — bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation it replaces,
  * so DuckDB-oracle `round(..., 6)` comparisons are unaffected.
  *
  * Why an expression: Spark's higher-order functions are CodegenFallback —
  * each invocation allocates lambda variables and evaluates interpreted,
  * which dominates similarity scans (one dot product per row or per
  * candidate pair). This generates a primitive loop over the two
  * `ArrayData`, stays inside whole-stage codegen, and allocates nothing.
  *
  * Inputs must have equal lengths (embedding columns do by construction);
  * mismatch throws rather than silently truncating. Null *elements* are
  * not expected (embeddings are dense) and read as 0.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorOps.dot($a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)})")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Called from generated code — primitive loop, no allocation. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"array_dot length mismatch: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Column wrapper. */
  def dotCol(a: Column, b: Column): Column =
    CatalystBridge.column(ArrayDot(CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
