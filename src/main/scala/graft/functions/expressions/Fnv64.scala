package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: FNV-1a 64-bit hash of a string column.
  *
  * This is the vertex-id assignment function for the GraphX bridge
  * ([[graft.plans.GraphAnalytics]]) and a general stable 64-bit key hash
  * (bucketing, salting, dedup keys). A Scala UDF would box every row and
  * block whole-stage codegen; this expression generates a tight byte loop
  * inline in the generated code, so key hashing stays inside the codegen
  * stage at 100 TB scan widths.
  *
  * (The reference has no equivalent — its keys are compared as strings in
  * O(n) list scans, `Graph.fs:54-56`; a 64-bit content hash is what makes
  * hash-partitioned joins on keys cheap at scale.)
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override protected def nullSafeEval(input: Any): Any =
    Fnv64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.Fnv64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 = copy(newChild)
}

object Fnv64 {
  /** FNV-1a over UTF-8 bytes — matches
    * [[graft.plans.GraphAnalytics.fnv64]] for ASCII keys and is the
    * canonical byte-level definition otherwise.
    */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Column wrapper. */
  def fnv64Col(c: Column): Column = CatalystBridge.column(Fnv64(CatalystBridge.expression(c)))
}
