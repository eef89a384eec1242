package graft.plans

import graft.functions.expressions.{ArrayDot, CdcCuts, DupGramCount, Fnv64, MaxRunCount, UnicodeNorm, WinnowingFp}
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
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    // rank-filter → bounded-heap rewrite (semantics guards in TopKRewrite)
    e.injectOptimizerRule(_ => TopKRewrite)
  }
}

object GraftExtensions {
  private val fnv64Builder: Seq[Expression] => Expression = exprs => Fnv64(exprs.head)

  private val arrayDotBuilder: Seq[Expression] => Expression =
    exprs => ArrayDot(exprs.head, exprs(1))

  // k and w must be literal ints in SQL text: winnowing_fp(text, 5, 8)
  private val winnowingBuilder: Seq[Expression] => Expression = { exprs =>
    def intArg(e: Expression, name: String): Int = {
      require(e.foldable, s"winnowing_fp: $name must be a literal integer")
      e.eval() match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"winnowing_fp: $name must be an integer literal, got $other")
      }
    }
    WinnowingFp(exprs.head, intArg(exprs(1), "k"), intArg(exprs(2), "w"))
  }

  private def literalInt(e: Expression, fname: String, arg: String): Int = {
    require(e.foldable, s"$fname: $arg must be a literal integer")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fname: $arg must be an integer literal, got $other")
    }
  }

  // dup_gram_count(toks, n): n must be a literal int in SQL text
  private val dupGramBuilder: Seq[Expression] => Expression =
    exprs => DupGramCount(exprs.head, literalInt(exprs(1), "dup_gram_count", "n"))

  // unicode_norm(text, 'NFC'): the form is a literal string (one-arg form
  // defaults to NFC)
  private val unicodeNormBuilder: Seq[Expression] => Expression = { exprs =>
    val form = if (exprs.length < 2) "NFC" else {
      require(exprs(1).foldable, "unicode_norm: form must be a literal string")
      String.valueOf(exprs(1).eval()).toUpperCase(java.util.Locale.ROOT)
    }
    UnicodeNorm(exprs.head, form)
  }

  private def fn(name: String, clazz: Class[_], b: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), b)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("fnv64", classOf[Fnv64], fnv64Builder),
    fn("array_dot", classOf[ArrayDot], arrayDotBuilder),
    fn("winnowing_fp", classOf[WinnowingFp], winnowingBuilder),
    fn("max_run_count", classOf[MaxRunCount],
      exprs => MaxRunCount(exprs.head, pairs = false)),
    fn("max_bigram_run", classOf[MaxRunCount],
      exprs => MaxRunCount(exprs.head, pairs = true)),
    fn("dup_gram_count", classOf[DupGramCount], dupGramBuilder),
    fn("unicode_norm", classOf[UnicodeNorm], unicodeNormBuilder),
    // cdc_cuts(text, k, divisor): k and divisor are literal ints
    fn("cdc_cuts", classOf[CdcCuts], exprs => CdcCuts(exprs.head,
      literalInt(exprs(1), "cdc_cuts", "k"),
      literalInt(exprs(2), "cdc_cuts", "divisor"))))

  /** Register all engine functions on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }
}
