package graft.plans

import graft.functions.expressions.Fnv64
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers the custom Catalyst expressions with
  * a SparkSession so they are callable from SQL text as well as the
  * Column API.
  *
  * Two wiring paths:
  *  - cluster submit: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (injected at session build);
  *  - an already-running session (tests, notebooks): [[GraftExtensions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.fnv64Description)
}

object GraftExtensions {
  private val fnv64Builder: Seq[Expression] => Expression = exprs => Fnv64(exprs.head)

  val fnv64Description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fnv64"),
    new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
    fnv64Builder)

  /** Register all engine functions on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("fnv64", fnv64Builder, "scala_udf")
}
