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
