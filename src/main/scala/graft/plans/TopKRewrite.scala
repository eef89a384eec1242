package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the classic windowed top-k idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o.desc)))
  *     .filter($"rn" <= k)
  *     .drop("rn")
  * }}}
  *
  * into the [[TopKPerGroup]] operator. Vanilla Spark executes the idiom
  * as shuffle + full per-partition SORT + window pass + filter (its own
  * `InferWindowGroupLimit` bounds the sort input but keeps the sort);
  * `TopKPerGroupExec` replaces all of it with two-phase bounded heaps —
  * no sort, and only ≤ k rows per group per task cross the shuffle.
  * This completes the custom-operator ladder end to end: Rule →
  * LogicalPlan → Strategy → Exec.
  *
  * The rewrite fires only where it is semantics-preserving:
  *   - single `row_number()` window expression, single DESCENDING order
  *     key on a non-nullable expression (row_number with NULLS LAST
  *     keeps null-key rows when a group has < k others; the heap drops
  *     nulls — so nullable keys are left alone);
  *   - the rank filter is `rn <= k`, `rn < k`, or `rn = 1`;
  *   - the enclosing Project discards the rank column (its value is not
  *     reconstructible from the heap).
  * For tied order keys both forms keep exactly k arbitrary tied rows —
  * the same nondeterminism the sort-based plan already has.
  *
  * Registration is explicit (`TopKRewrite.enable(spark)` /
  * `GraftExtensions`), not global: an engine should opt into plan
  * rewrites, not inherit them silently.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, Seq(SortOrder(oExpr, Descending, NullsLast, _)), wChild, _)))
        if !oExpr.nullable =>
      val rn = al.toAttribute
      // Spark's InferWindowGroupLimit may already have bounded the
      // window's input; the limit node is redundant under the heap
      val child = wChild match {
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case other => other
      }
      extractK(cond, rn) match {
        case Some(k)
            if k >= 1 &&
              part.nonEmpty && // global top-k: ClusteredDistribution(Nil) is invalid — leave to TakeOrdered
              projList.forall(!_.references.contains(rn)) &&
              projList.forall(_.references.subsetOf(child.outputSet)) =>
          Project(projList, TopKPerGroup(part, oExpr, k, child))
        case _ => p
      }
  }

  private def extractK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  /** Opt in on a session (idempotent); also registers the strategy that
    * plans the rewritten node.
    */
  def enable(spark: SparkSession): Unit = {
    TopKPerGroup.register(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }
}
