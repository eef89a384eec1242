package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all document-quality counters in ONE pass
  * over the text — `(n_chars, n_tokens, n_punct, n_upper, n_stop)`.
  *
  * The column formulation needed two `regexp_replace` rewrites of the
  * full text (each allocating a rewritten copy) plus a split + two
  * higher-order filters per row; this walks the characters once, tracks
  * token boundaries inline, and compares candidate tokens against the
  * (lowercased) stopword set without allocating per token unless a token
  * is plausibly a stopword. Semantics match the column form exactly:
  * tokens split on Java `\s`, punctuation is `\p{Punct}` (the 32 ASCII
  * graphic non-alphanumerics, = POSIX `[[:punct:]]` for the oracle),
  * stopword comparison is case-insensitive.
  */
case class QualityCounts(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  override def prettyName: String = "quality_counts"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    QualityCounts.compute(input.asInstanceOf[UTF8String].toString, stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.QualityCounts.compute($c.toString(), $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityCounts =
    copy(child = newChild)
}

object QualityCounts {

  // tiny sets; memoized per-set so the scan pays no per-row recompute
  private val maxLenCache =
    new java.util.concurrent.ConcurrentHashMap[java.util.HashSet[String], Integer]()
  private def maxLen(stops: java.util.HashSet[String]): Int =
    maxLenCache.computeIfAbsent(stops, s => {
      var m = 0
      s.forEach(w => m = math.max(m, w.length))
      Integer.valueOf(m)
    }).intValue()

  private def isJavaSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  /** One pass: counts + inline tokenization. Called from generated code. */
  def compute(s: String, stops: java.util.HashSet[String]): InternalRow = {
    val n = s.length
    // n_chars counts CODE POINTS (what Spark's length() returns), not
    // UTF-16 code units — they differ for non-BMP text
    val nChars = s.codePointCount(0, n)
    var punct = 0
    var upper = 0
    var tokens = 0
    var stopHits = 0
    var tokStart = -1
    var i = 0
    val maxStopLen = maxLen(stops)
    def closeToken(end: Int): Unit = {
      if (tokStart >= 0) {
        tokens += 1
        // skip the substring allocation unless the token could be a stopword
        if (end - tokStart <= maxStopLen &&
            stops.contains(s.substring(tokStart, end)
              .toLowerCase(java.util.Locale.ROOT))) stopHits += 1
        tokStart = -1
      }
    }
    while (i < n) {
      val c = s.charAt(i)
      if (isJavaSpace(c)) closeToken(i)
      else {
        if (tokStart < 0) tokStart = i
        if (isPunct(c)) punct += 1
        else if (c >= 'A' && c <= 'Z') upper += 1
      }
      i += 1
    }
    closeToken(n)
    InternalRow(nChars, tokens, punct, upper, stopHits)
  }

  /** Column wrapper. */
  def qualityCountsCol(text: Column, stopwords: Seq[String]): Column =
    CatalystBridge.column(QualityCounts(CatalystBridge.expression(text), stopwords))
}
