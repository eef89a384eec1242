package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing fingerprints (Schleimer et al.,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD '03 —
  * the MOSS scheme). Hash every `k`-char gram with a rolling polynomial
  * hash, keep the minimum hash of each sliding window of `w` consecutive
  * gram hashes, return the distinct minima sorted ascending.
  *
  * The array-expression formulation ([[graft.functions.TextOps]] history)
  * was O(n·w) per row *and* re-evaluated the whole gram-hash array inside
  * every windowed-min lambda (no CSE across higher-order-function calls) —
  * ~300× redundant work. This expression is a single O(n) pass: the gram
  * hash rolls in O(1) per position and the windowed min uses a monotonic
  * deque, so fingerprinting stays linear in document bytes at 100 TB scan
  * widths. Codegen emits one static call, keeping the whole-stage pipeline
  * intact.
  *
  * Hash scheme (chosen to be replicable in ANSI SQL for the DuckDB
  * oracle): `h(gram) = (Σ_j code(gram[j]) · B^(k-1-j)) mod P` with B = 31
  * and P = 2^31 − 1, over UTF-16 code units (= code points for the BMP
  * text this engine fingerprints).
  *
  * Texts shorter than `k` characters produce no grams → an empty array.
  */
case class WinnowingFp(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive (k=$k, w=$w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fp"

  override protected def nullSafeEval(input: Any): Any =
    Winnowing.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Winnowing.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFp =
    copy(child = newChild)
}

object Winnowing {
  /** Polynomial base; `Base^(k-1)` stays ≪ 2^63 for any sane k. */
  val Base: Long = 31L
  /** Mersenne modulus 2^31 − 1 — residues fit DuckDB BIGINT arithmetic. */
  val Mod: Long = (1L << 31) - 1

  /** Single-pass winnowing over a string: rolling gram hash + monotonic
    * deque windowed min. Called from generated code — keep it static and
    * allocation-light.
    */
  def compute(s: String, k: Int, w: Int): ArrayData = {
    val n = s.length
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])

    // B^(k-1) mod P, for removing the outgoing character
    var bk1 = 1L
    var i = 0
    while (i < k - 1) { bk1 = bk1 * Base % Mod; i += 1 }

    // initial gram hash
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }

    // monotonic deque of (gram index) with increasing hash values;
    // hashes stored alongside to avoid recomputation
    val hashes = new Array[Long](nGrams)
    hashes(0) = h
    var g = 1
    while (g < nGrams) {
      val out = s.charAt(g - 1)
      val in = s.charAt(g + k - 1)
      h = ((h - out * bk1 % Mod + Mod) % Mod * Base + in) % Mod
      hashes(g) = h
      g += 1
    }

    val deque = new Array[Int](nGrams) // indices into hashes
    var head = 0
    var tail = 0 // exclusive
    val mins = new java.util.TreeSet[java.lang.Long]()
    g = 0
    while (g < nGrams) {
      // evict indices that left the window [g-w+1, g]
      while (head < tail && deque(head) <= g - w) head += 1
      // maintain increasing hash order (<= keeps the RIGHTMOST minimum,
      // but since we only collect distinct values the choice is moot)
      while (head < tail && hashes(deque(tail - 1)) >= hashes(g)) tail -= 1
      deque(tail) = g
      tail += 1
      // first full window ends at g = w-1; if there are fewer grams than
      // w, the single window closes at the last gram
      if (g >= w - 1 || g == nGrams - 1) mins.add(hashes(deque(head)))
      g += 1
    }

    val arr = new Array[Long](mins.size())
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** Column wrapper. */
  def winnowingFpCol(c: Column, k: Int, w: Int): Column =
    CatalystBridge.column(WinnowingFp(CatalystBridge.expression(c), k, w))
}
