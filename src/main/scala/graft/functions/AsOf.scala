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

  /** Banded interval-overlap join — the other temporal join Spark's
    * built-in API lacks (batch twin of the stream-stream interval join):
    * every pair of intervals from `a` and `b` that share `key` AND
    * overlap in time, with the exact overlap length attached.
    *
    * Inputs both carry `(key, id, start_s, end_s)` with integer-second
    * bounds and `end_s - start_s <= bucketSeconds` (checked per row —
    * violating rows would silently lose pairs, so they fail loudly).
    *
    * The naive formulation — join on `key` with the overlap predicate —
    * is a per-key cross product: Catalyst can only plan the range
    * predicate as a post-join filter, so a hot key with f intervals per
    * side generates f² candidate rows BEFORE the filter. The banded form
    * bounds the blowup structurally: time splits into fixed
    * `bucketSeconds` buckets, each interval explodes to the (≤ 2,
    * because duration ≤ bucket width) buckets it touches, the join runs
    * on `(key, bucket)` equi-keys, and a `distinct` collapses the pairs
    * seen in both buckets. Candidates are now bounded by TRUE temporal
    * co-location — two intervals meet only if they land in the same
    * bucket — which is the property that holds at 100 TB where per-key
    * fan-out does not. Genomics overlap joins and ad-attribution
    * windows are this exact shape.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame, key: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucket width must be positive: $bucketSeconds")
    def banded(df: DataFrame, side: String) = {
      val start = col(s"${side}_start")
      val end = col(s"${side}_end")
      // the duration check lives INSIDE the bucket expression so column
      // pruning cannot optimize it away: an over-long interval raises
      // instead of silently losing the pairs its missing buckets hide
      val buckets = when(
        (end - start).between(lit(0L), lit(bucketSeconds)),
        sequence(expr(s"${side}_start div ${bucketSeconds}L"),
          expr(s"${side}_end div ${bucketSeconds}L")))
        .otherwise(raise_error(concat(
          lit(s"intervalOverlap: $side interval exceeds bucketSeconds=$bucketSeconds at id="),
          col(s"${side}_id").cast("string"))))
      df.select(col(key), col("id").as(s"${side}_id"),
        col("start_s").cast("long").as(s"${side}_start"),
        col("end_s").cast("long").as(s"${side}_end"))
        .withColumn("bkt", explode(buckets))
    }
    banded(a, "a").join(banded(b, "b"), Seq(key, "bkt"))
      .drop("bkt").distinct()
      .withColumn("overlap_s",
        least(col("a_end"), col("b_end")) - greatest(col("a_start"), col("b_start")))
      .filter(col("overlap_s") > 0)
  }
}
