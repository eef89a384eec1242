package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams: funnel conversion and
  * retention cohorts — the product-analytics twins of the pipeline's
  * telemetry monitoring ([[Anomaly]]).
  *
  * Both operators reduce the event table to per-user scalars before
  * anything joins: every join/aggregate is keyed on the user, partial
  * aggregation collapses each partition to one row per user per step,
  * and step frontiers only ever SHRINK (funnel step k+1 is a subset of
  * step k's users). Timestamps and counts are exact integers — nothing
  * here has a float.
  */
object Events {

  /** Ordered funnel: for each step k, the users whose first step-k event
    * happens strictly AFTER their first step-(k-1) completion (the
    * classic first-touch funnel). Returns one row per step:
    * `(step, event_type, n_users)`.
    *
    * Each step is one filtered aggregate joined to the previous
    * frontier on the user key — k steps = k user-keyed shuffles over
    * ever-shrinking frontiers, never a per-user ordered array in memory.
    */
  def funnel(df: DataFrame, user: Column, ts: Column, eventType: Column,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = df.select(user.as("user_id"), ts.as("ts"), eventType.as("et"))
    val frontiers = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val stepEvents = ev.filter(col("et") === step)
        val reachable = prev match {
          case None => stepEvents
          case Some(f) => stepEvents
            .join(f.select(col("user_id"), col("t").as("prev_t")), "user_id")
            .filter(col("ts") > col("prev_t"))
        }
        Some(reachable.groupBy("user_id").agg(min(col("ts")).as("t")))
    }.flatten
    frontiers.zip(steps).zipWithIndex.map { case ((f, step), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("step")
  }

  /** Funnel TIME-TO-CONVERT quantiles — the latency companion of
    * [[funnel]] (which reports only how many users survive each step):
    * per transition, the exact lower-median / p90 / max of the delay in
    * whole minutes between a user's first-touch at step i and their
    * first qualifying touch at step i+1. Conversion COUNTS without
    * conversion LATENCY hide a dying funnel whose users still trickle
    * through; the p90 is the number an SLA on re-engagement nudges is
    * set against.
    *
    * Quantiles are EXACT integers via the histogram-rank technique
    * (p70/p157): group delays to (transition, minute) counts, one
    * cumulative window per transition over DISTINCT minute values
    * (bounded, never user-sized), pick the smallest value whose
    * cumulative count reaches the rank — lower median at `(n+1) div 2`,
    * p90 at `ceil(9n/10) = (9n+9) div 10`. No float percentile
    * estimate anywhere, so the table hash-reproduces on any engine.
    */
  def funnelLatency(df: DataFrame, user: Column, ts: Column,
                    eventType: Column, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "funnelLatency needs at least two steps")
    import org.apache.spark.sql.expressions.Window
    val ev = df.select(user.as("user_id"), ts.as("ts"), eventType.as("et"))
    val frontiers = steps.scanLeft(Option.empty[DataFrame]) {
      case (prev, step) =>
        val stepEvents = ev.filter(col("et") === step)
        val reachable = prev match {
          case None => stepEvents.select(col("user_id"), col("ts"),
            lit(null).cast("timestamp").as("prev_t"))
          case Some(f) => stepEvents
            .join(f.select(col("user_id"), col("t").as("pt")), "user_id")
            .filter(col("ts") > col("pt"))
            .select(col("user_id"), col("ts"), col("pt").as("prev_t"))
        }
        Some(reachable.groupBy("user_id")
          .agg(min(col("ts")).as("t"), min(col("prev_t")).as("prev_t")))
    }.flatten
    // min(prev_t) pairs each user's first step-(i+1) touch with their
    // first step-i touch: prev_t is constant per user within a frontier
    val delays = frontiers.tail.zipWithIndex.map { case (f, i) =>
      f.select(lit(i + 1).as("step"),
        lit(s"${steps(i)}->${steps(i + 1)}").as("transition"),
        expr("(unix_timestamp(t) - unix_timestamp(prev_t)) div 60")
          .as("delay_min"))
    }.reduce(_ unionByName _)
    val hist = delays.groupBy("step", "transition", "delay_min")
      .agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy("transition").orderBy("delay_min")
      .rowsBetween(Window.unboundedPreceding, 0)
    val nW = Window.partitionBy("transition")
    hist.select(col("step"), col("transition"), col("delay_min"),
        sum(col("cnt")).over(cumW).as("cum"),
        sum(col("cnt")).over(nW).as("n"),
        max(col("delay_min")).over(nW).as("max_min"))
      .groupBy("step", "transition")
      .agg(max(col("n")).as("n_users"),
        min(when(expr("cum >= (n + 1) div 2"), col("delay_min")))
          .as("median_min"),
        min(when(expr("cum >= (9 * n + 9) div 10"), col("delay_min")))
          .as("p90_min"),
        max(col("max_min")).as("max_min"))
      .orderBy("step")
  }

  /** Retention cohorts: users grouped by their FIRST-event date, counted
    * by distinct activity-day offset — `(cohort_date, day_offset,
    * n_users)`. Two user-keyed aggregates and one join; day arithmetic
    * on DATE values (exact), counts exact longs.
    */
  def retention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val ev = df.select(user.as("user_id"), to_date(ts).as("day"))
    val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_date"))
    ev.join(cohort, "user_id")
      .select(col("cohort_date"),
        datediff(col("day"), col("cohort_date")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort_date").cast("string").as("cohort_date"),
        col("day_offset"), col("n_users"))
      .orderBy("cohort_date", "day_offset")
  }
}
