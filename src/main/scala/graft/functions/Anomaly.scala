package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-window anomaly detection over an ordered event stream — the
  * data-quality monitoring shape a pipeline runs over ingest telemetry
  * (per-source row counts, latencies, value drift): flag an event whose
  * value deviates from its own trailing window by more than `k` standard
  * deviations.
  *
  * Scale shape: one shuffle, keyed on the entity (the window partition);
  * the trailing frame is ROWS-based so state per row is the fixed-size
  * frame, never the history. That is the same execution shape as q07's
  * running sum — Spark's WindowExec streams each partition once.
  *
  * Cross-engine determinism: floating-point window aggregates are NOT
  * portable — engines disagree on summation order for sliding frames
  * (incremental add/remove vs segment trees), and a last-ulp difference
  * flips a threshold flag. So values are pre-rounded to a 1e-3 integer
  * grid and BOTH rolling moments are exact-long sums; the k-sigma test
  * is evaluated in pure integer arithmetic:
  *   |v − S/n| > k·σ  ⟺  (n·v − S)² > k²·(n·SS − S²)
  * (with σ² the population variance of the window). Any engine computes
  * the identical flag — no rounding, no epsilon.
  */
object Anomaly {

  /** Events whose milli-scaled value fails the k-sigma test against the
    * trailing `window` events of the same `entity` (frame excludes the
    * current row; rows without a FULL trailing window are never flagged
    * — a short history has no stable baseline). Output: `(event_id,
    * entity, v_milli, win_sum_milli)` for each flagged event — the
    * window SUM is emitted rather than the mean because the sum is
    * integer-exact for any window size (the mean generally is not).
    *
    * `k` must be an integer (the test squares it exactly).
    *
    * PRECONDITION (64-bit exactness): every product below is computed in
    * signed 64-bit longs. The largest operand is `k² · (n·ss − s²)` ≤
    * `k² · n² · max(v)²`, so the milli-scaled magnitude must satisfy
    * `|v| ≤ 3.03e9 / (k · n)` — for the defaults (n=10, k=2) that is
    * `|value| ≤ 1.5e5` in raw units. Beyond that, non-ANSI Spark wraps
    * silently while HUGEINT-widening oracle engines do not, so the
    * cross-engine exactness contract breaks; [[kSigmaFlags]] fails fast on
    * such inputs rather than diverging silently. The guard is fused into
    * the staging projection (one comparison per row inside whole-stage
    * codegen, no extra pass or shuffle): an out-of-bound row raises with
    * the offending value.
    */
  def kSigmaFlags(df: DataFrame, id: Column, entity: Column, ts: Column,
                  value: Column, window: Int = 10, k: Int = 2): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    require(k >= 1, s"k must be >= 1: $k")
    val maxAbsV = 3030000000L / (k.toLong * window.toLong)
    val w = Window.partitionBy("entity").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-window, -1)
    val vRaw = round(value * lit(1000)).cast("long")
    val vChecked = when(abs(vRaw) > maxAbsV,
      raise_error(concat(
        lit(s"kSigmaFlags: |v_milli| exceeds the 64-bit-exact bound $maxAbsV " +
          s"(window=$window, k=$k): "), vRaw.cast("string"))).cast("long"))
      .otherwise(vRaw)
    val staged = df.select(id.as("event_id"), entity.as("entity"), ts.as("ts"),
      vChecked.as("v"))
    val n = lit(window.toLong)
    staged
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("ss", sum(col("v") * col("v")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === window)
      .withColumn("dev", n * col("v") - col("s"))
      .filter(col("dev") * col("dev") >
        lit((k * k).toLong) * (n * col("ss") - col("s") * col("s")))
      .select(col("event_id"), col("entity"), col("v").as("v_milli"),
        col("s").as("win_sum_milli"))
  }

  /** CUSUM change-point alarm over a time-bucketed count series — the
    * SEQUENTIAL drift detector beside the point-wise gates ([[kSigmaFlags]]
    * flags single outliers; p80 compares whole distributions): a
    * sustained small shift that never trips a per-point test
    * accumulates in the CUSUM statistic and alarms within a few
    * buckets. Page's recursion `S_t = max(0, S_{t−1} + x_t − μ − κ)`
    * looks inherently sequential, but it has a closed PREFIX form:
    * with `y_t = prefix_t − t·(μ+κ)`,  `S_t = y_t − min_{j≤t} y_j` —
    * two cumulative windows over the BUCKET aggregate (bounded by the
    * time range, never row-sized), all exact integers (μ and κ by
    * floor division).
    *
    * Output one row per bucket: `(bucket, n, cusum, alarm)` with
    * `alarm = 1` when the statistic clears the threshold `h = μ` —
    * the "counts ran ≥5% hot long enough to add up to a full mean
    * bucket" reading under the default κ = μ/20.
    */
  def cusumAlarm(df: DataFrame, ts: Column,
                 slackDen: Long = 20L): DataFrame =
    cusumFromBuckets(bucketCounts(df, ts), slackDen)

  /** The maintained artifact behind [[cusumAlarm]]: per-hour counts.
    * Counts are commutative sums, so waves merge by re-aggregation —
    * the maintained series equals the one-shot series exactly (the
    * p145/p155 maintenance discipline), and the alarm computed from a
    * wave-merged store is bit-identical to the batch answer.
    */
  def bucketCounts(df: DataFrame, ts: Column): DataFrame =
    df.groupBy(date_format(date_trunc("hour", ts), "yyyy-MM-dd HH:mm:ss")
        .as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Merge per-wave bucket counts into the standing store (plain
    * re-aggregation — sums are commutative and associative).
    */
  def mergeBucketCounts(store: DataFrame, wave: DataFrame): DataFrame =
    store.unionByName(wave).groupBy("bucket")
      .agg(sum(col("n")).as("n"))

  /** The CUSUM readout over a `(bucket, n)` series — see [[cusumAlarm]]. */
  def cusumFromBuckets(hourly: DataFrame, slackDen: Long = 20L): DataFrame = {
    require(slackDen >= 1, s"slackDen must be positive: $slackDen")
    val stats = hourly.agg(sum(col("n")).as("tot"), count(lit(1)).as("nh"))
    val ord = Window.orderBy("bucket")
    val cum = ord.rowsBetween(Window.unboundedPreceding, 0)
    hourly.crossJoin(broadcast(stats))
      .select(col("bucket"), col("n"),
        expr("tot div nh").as("mean"),
        expr("(tot div nh) div " + slackDen).as("slack"),
        row_number().over(ord).as("t"),
        sum(col("n")).over(cum).as("prefix"))
      .withColumn("y", col("prefix") - col("t") * (col("mean") + col("slack")))
      // least(0, min): Page's recursion anchors at S_0 = 0, i.e. the prefix
      // form's running minimum includes the implicit y_0 = 0 — without it a
      // series that runs hot from the first bucket (all-positive y prefix)
      // reads y_t - min_{j>=1} y_j instead of y_t and the alarm is delayed
      .withColumn("cusum", col("y") - least(lit(0L), min(col("y")).over(cum)))
      .select(col("bucket"), col("n"), col("cusum"),
        when(col("cusum") > col("mean"), 1).otherwise(0).cast("int")
          .as("alarm"))
      .orderBy("bucket")
  }
}
