package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — an operator Spark's built-in API lacks.
  * For every left row, attach the LATEST right row with the same key and
  * `right.ts <= left.ts` (left-join semantics: unmatched left rows keep
  * nulls).
  *
  * Implementation is the union-and-window form, NOT a range join: tag
  * both inputs, union them, and run one per-key window ordered by
  * `(ts, side)` where right rows sort before left rows at equal
  * timestamps (inclusive `<=`); `last(right_payload, ignoreNulls)` then
  * carries the most recent right payload forward onto each left row.
  *
  * Scale shape: ONE shuffle (hash on the key for the window), cost
  * linear in |left| + |right| — a naive `l.ts >= r.ts` range join is a
  * per-key cross product (quadratic for hot keys) followed by a
  * max-per-row aggregation, which is exactly what dies on a 100 TB
  * event store. Skewed keys can pre-split by time range; timestamps
  * within a (key, ts) tie should be pre-deduplicated by the caller if
  * right-side ties are possible (the join itself breaks ties by right
  * input order only deterministically if (key, ts) is unique on the
  * right — same contract as DuckDB/kdb asof).
  */
object AsOf {

  /** `left` and `right` must both carry `key` and `ts` columns; every
    * other right column comes back nullable with `prefix` prepended.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               prefix: String = "asof_"): DataFrame = {
    val rValueCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(rValueCols.nonEmpty, "asofJoin: right side needs at least one value column")
    val lValueCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    val rPayload = struct(rValueCols.map(col): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), rPayload.as("__r")) ++
        lValueCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        lValueCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        Seq(col(key), col(ts)) ++ lValueCols.map(col) ++
          rValueCols.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }
}
