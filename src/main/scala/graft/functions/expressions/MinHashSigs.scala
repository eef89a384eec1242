package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full MinHash signature in ONE pass
  * over a row's gram-hash array.
  *
  * The array-expression formulation (`array(array_min(transform(hs, ...)),
  * ... × numHashes)`) evaluates `numHashes` separate `transform` calls,
  * each materializing an intermediate array the length of the gram list —
  * for a 500-gram document and 64 permutations that is 64 heap arrays and
  * ~32k boxed writes per row, and it dominated the per-batch cost of the
  * streaming dedup path. This expression runs the textbook loop instead:
  * for each gram hash, update all `numHashes` running minima — identical
  * values (same permutation parameters, same `(a*h+b) mod (2^31-1)`
  * arithmetic), zero intermediate allocation, and codegen keeps it inside
  * the whole-stage pipeline.
  *
  * An empty gram array yields an all-null signature, matching
  * `array_min` over an empty transform. (In practice
  * [[graft.functions.Dedup.wordNgrams]] never emits an id without grams.)
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.MinHashSigs.compute($c, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSigs {

  private val MersennePrime = (1L << 31) - 1

  /** Flattened `(a, b)` permutation parameters, cached per
    * `(numHashes, seed)`. MUST stay in lockstep with
    * [[graft.functions.Dedup.permutationParams]] — the splitmix recurrence
    * is duplicated here (rather than imported) to keep this object
    * dependency-free for generated code; [[graft.functions.DedupSpec]]
    * pins the equality.
    */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()

  def params(numHashes: Int, seed: Long): Array[Long] =
    paramCache.computeIfAbsent((numHashes, seed), { _ =>
      val out = new Array[Long](numHashes * 2)
      var x = seed
      def next(): Long = {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        (z & Long.MaxValue) % MersennePrime
      }
      var i = 0
      while (i < numHashes) {
        out(2 * i) = math.max(1L, next())
        out(2 * i + 1) = next()
        i += 1
      }
      out
    })

  /** One pass over the gram hashes, all minima at once. Called from
    * generated code — static, allocation-light.
    */
  def compute(hs: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val ps = params(numHashes, seed)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var g = 0
    while (g < n) {
      val h = hs.getLong(g)
      var j = 0
      while (j < numHashes) {
        // a,b,h < 2^31 ⇒ a*h+b < 2^62: no overflow, no pmod needed
        // (operands are non-negative)
        val v = (ps(2 * j) * h + ps(2 * j + 1)) % MersennePrime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  def minHashSigCol(hs: Column, numHashes: Int, seed: Long = 42L): Column =
    CatalystBridge.column(MinHashSig(CatalystBridge.expression(hs), numHashes, seed))
}
