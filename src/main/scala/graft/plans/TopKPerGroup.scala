package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.CatalystBridge

import scala.collection.mutable

/** Custom whole-operator: grouped top-k.
  *
  * The DataFrame idiom (`row_number().over(partitionBy(g).orderBy(o))`
  * then `filter(rn <= k)`) SORTS every group fully and materializes every
  * row through the window operator before discarding all but k — at
  * 100 TB that is a full shuffle + full sort of the fact table to keep a
  * few rows per key. This operator keeps a bounded heap per group and
  * runs in two phases like an aggregate: a partial pass on the map side
  * (each task retains ≤ k rows per group it sees), then a final pass
  * after clustering on the group keys. Shuffle volume drops from |rows|
  * to ≤ k·|groups|·|tasks|, and no sort is performed at all.
  *
  * This is preference-ladder item (c) of the build plan: a logical node +
  * planner strategy + physical exec, registered per session.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExpr: Expression,      // rows with the LARGEST orderExpr are kept
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val oExpr = orderExpr
    val kk = k
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(gExprs, childOutput)
      val bound = BindReferences.bindReference(oExpr, childOutput)
      val valueOrd = TypeUtils.getInterpretedOrdering(bound.dataType)
      // heap head = the WORST retained row (smallest value) so eviction is O(log k)
      val heapOrd: Ordering[(Any, InternalRow)] =
        Ordering.by[(Any, InternalRow), Any](_._1)(valueOrd).reverse
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[(Any, InternalRow)](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        // struct-typed order values are reused mutable row buffers —
        // copy before retaining, or every heap entry aliases one buffer.
        // null order values are excluded (NULLS-LAST semantics: a null
        // can never be in the top k).
        bound.eval(row) match {
          case null =>
          case r: InternalRow =>
            insert(heap, r.copy(), row, kk, valueOrd)
          case x =>
            insert(heap, x, row, kk, valueOrd)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }
  }

  private def insert(heap: mutable.PriorityQueue[(Any, InternalRow)], v: Any,
                     row: InternalRow, k: Int, ord: Ordering[Any]): Unit = {
    if (heap.size < k) heap.enqueue((v, row.copy()))
    else if (ord.gt(v, heap.head._1)) {
      heap.dequeue()
      heap.enqueue((v, row.copy()))
    }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  import org.apache.spark.sql.execution.{SparkPlan => P}
  override def apply(plan: LogicalPlan): Seq[P] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      // two-phase: map-side partial heaps, then cluster on keys + final
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Register the planner strategy on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy

  /** Column-API entry: rows with the k largest `order` values per group.
    * Break ties inside `order` (e.g. `struct(score, -id)`) — rows beyond
    * a tie at the k boundary are dropped arbitrarily otherwise.
    *
    * Group/order expressions are materialized as hidden columns first and
    * referenced by name: the analyzer resolves plain `UnresolvedAttribute`s
    * inside custom nodes, but not Column-node placeholders.
    */
  def topK(df: DataFrame, groupCols: Seq[Column], order: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val spark = df.sparkSession
    register(spark)
    val gNames = groupCols.indices.map(i => s"__topk_g$i")
    val oName = "__topk_o"
    val prepared = groupCols.zip(gNames)
      .foldLeft(df) { case (d, (c, n)) => d.withColumn(n, c) }
      .withColumn(oName, order)
    CatalystBridge.ofRows(spark,
      TopKPerGroup(
        gNames.map(n => UnresolvedAttribute(n)),
        UnresolvedAttribute(oName),
        k,
        CatalystBridge.logicalPlan(prepared)))
      .drop((gNames :+ oName): _*)
  }
}
