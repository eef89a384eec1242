package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: strict ordering — steps out of order do not convert") {
    val ev = Seq(
      // user 1 completes the whole funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2 clicks BEFORE viewing → click never counts; purchase
      // after the view exists but needs a post-view click first
      (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "purchase"),
      // user 3 views only
      (3L, 10L, "view"),
      // user 4 re-clicks after an early click: first view at 10, clicks
      // at 5 (too early) and 15 (counts), no purchase
      (4L, 5L, "click"), (4L, 10L, "view"), (4L, 15L, "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)), out.toString)
  }

  test("funnel: ties are not conversions (strictly after)") {
    val ev = Seq((1L, 10L, "view"), (1L, 10L, "click")).toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("view", 1L), ("click", 0L)))
  }

  test("retention: cohort by first day, distinct activity offsets") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 12:00:00"), // same offset once
      (1L, "2024-01-03 09:00:00"),
      (2L, "2024-01-01 23:00:00"), (2L, "2024-01-02 01:00:00"),
      (3L, "2024-01-02 08:00:00")
    ).toDF("user_id", "t").select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val out = Events.retention(ev, col("user_id"), col("ts"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L),  // users 1 and 2 on their first day
      ("2024-01-01", 1, 1L),  // user 2 back next day
      ("2024-01-01", 2, 1L),  // user 1 back on day 3
      ("2024-01-02", 0, 1L)), // user 3's cohort
      out.toString)
  }

  test("funnelLatency: first-touch delays, exact median/p90 ranks") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")
    // users 1..3 view at 10:00; clicks at +1, +5, +10 min; a pre-view
    // click (user 4) never qualifies; user 3 later purchases at +20
    val ev = Seq(
      (1L, t(0), "view"), (2L, t(0), "view"), (3L, t(0), "view"),
      (1L, t(1), "click"), (2L, t(5), "click"), (3L, t(10), "click"),
      (4L, t(2), "click"), // no prior view: excluded
      (3L, t(30), "purchase")).toDF("user_id", "ts", "event_type")
    val rows = graft.functions.Events.funnelLatency(ev, col("user_id"),
        col("ts"), col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // delays view->click: 1, 5, 10 → n=3, lower median rank (3+1)/2=2 → 5,
    // p90 rank (27+9)/10=3 → 10, max 10; click->purchase: user 3, 20 min
    assert(rows == Seq(
      (1, "view->click", 3L, 5L, 10L, 10L),
      (2, "click->purchase", 1L, 20L, 20L, 20L)))
  }
}
