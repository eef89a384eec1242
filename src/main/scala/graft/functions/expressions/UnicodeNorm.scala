package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD)
  * of a string column.
  *
  * Why it matters in a training-data pipeline: the same text arrives in
  * composed and decomposed encodings ("é" as U+00E9 vs U+0065 U+0301),
  * full-width vs half-width forms, compatibility ligatures — all of which
  * defeat EXACT dedup and fingerprinting even though the text is
  * identical to a reader. Canonicalizing before hashing is the standard
  * first step (NFC for identity-preserving, NFKC for aggressive
  * compatibility folding). Spark has no built-in for this; a Scala UDF
  * would box every row and break whole-stage codegen, so this expression
  * calls `java.text.Normalizer` directly from generated code. The
  * `Normalizer.isNormalized` fast path skips building a second string
  * for the common already-normalized (e.g. pure-ASCII) case.
  *
  * The `form` is a case-object parameter (not a child expression): it is
  * part of the operator's identity, constant per plan.
  */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {
  require(UnicodeNorm.Forms.contains(form),
    s"unknown normalization form $form (expected one of ${UnicodeNorm.Forms.mkString(", ")})")

  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_norm_$form"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.expressions.UnicodeNorm.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Called from generated code. Already-normalized strings (the dominant
    * case on mostly-ASCII corpora) return the input UTF8String unchanged
    * instead of re-encoding a normalized copy.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column wrapper; `form` one of NFC/NFD/NFKC/NFKD. */
  def normCol(c: Column, form: String = "NFC"): Column =
    CatalystBridge.column(UnicodeNorm(CatalystBridge.expression(c), form))
}
