package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed-aggregation path SURVEY §2.11 names: an
  * `Aggregator[IN, BUF, OUT]` replicating the reference's statistics
  * fold (ref `Library.fs:338-363` — a single pass accumulating
  * conditional counts over source nodes) one-to-one as
  * zero/reduce/merge/finish.
  *
  * The untyped `GraphState.conditionalCounts` (g14) is the
  * production form — `sum(when(...))` stays entirely in whole-stage
  * codegen. This typed twin exists because the fold's shape (an
  * explicit associative+commutative monoid) is the contract Spark
  * distributes: `reduce` runs map-side per partition, `merge` combines
  * partial buffers at the reducer — exactly the reference's fold split
  * across executors. Equivalence of the two forms is asserted by
  * TypedFoldsSpec and the shared g14/g41 oracle.
  */
object TypedFolds {

  /** Typed projection of an order node's payload facts. */
  final case class OrderFacts(totalprice: Double, orderstatus: String)

  /** The fold state/result: the same four counters as g14. */
  final case class FoldCounts(high_value: Long, n_f: Long, n_o: Long, n_p: Long)

  val orderStats: Aggregator[OrderFacts, FoldCounts, FoldCounts] =
    new Aggregator[OrderFacts, FoldCounts, FoldCounts] {
      override def zero: FoldCounts = FoldCounts(0L, 0L, 0L, 0L)
      override def reduce(b: FoldCounts, a: OrderFacts): FoldCounts = FoldCounts(
        b.high_value + (if (a.totalprice > 300000) 1L else 0L),
        b.n_f + (if (a.orderstatus == "F") 1L else 0L),
        b.n_o + (if (a.orderstatus == "O") 1L else 0L),
        b.n_p + (if (a.orderstatus == "P") 1L else 0L))
      override def merge(b1: FoldCounts, b2: FoldCounts): FoldCounts = FoldCounts(
        b1.high_value + b2.high_value, b1.n_f + b2.n_f,
        b1.n_o + b2.n_o, b1.n_p + b2.n_p)
      override def finish(r: FoldCounts): FoldCounts = r
      override def bufferEncoder: Encoder[FoldCounts] = Encoders.product[FoldCounts]
      override def outputEncoder: Encoder[FoldCounts] = Encoders.product[FoldCounts]
    }
}
