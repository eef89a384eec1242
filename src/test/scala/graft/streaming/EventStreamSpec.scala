package graft.streaming

import graft.SparkSpec
import graft.sources.TpchGraph
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stateful-streaming sessionization equals the batch answer") {
    val events = TpchGraph.events(spark, sf)
    val batch = EventStream.sessionizeBatch(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val typed = events.select(
        col("user_id"),
        unix_micros(col("ts")).as("tsMicros"),
        col("value"))
      .as[EventStream.SessionEvent]
    val stateful = EventStream.sessionizeStateful(typed, gapMinutes = 30)
      .collect().map(s => (s.user_id, s.session_start, s.n_events)).toSet

    assert(stateful == batch)
    assert(batch.nonEmpty)
  }

  test("built-in session_window equals the batch sessionizer on the events table") {
    val events = TpchGraph.events(spark, sf)
    val batch = EventStream.sessionizeBatch(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val builtin = EventStream.sessionizeBuiltin(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // the two differ only on events spaced EXACTLY at the gap — absent
    // from this data (asserted by equality holding)
    assert(builtin == batch)
    assert(batch.nonEmpty)
  }

  test("session_window boundary: exactly-gap-spaced events merge in both forms") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 00:30:00") // exactly 1800 s later
    val t2 = Timestamp.valueOf("2026-01-01 00:30:01") // one past the gap
    val events = Seq((1L, t0, 1L, 1.0), (1L, t1, 2L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    // both forms keep an exactly-gap-spaced event in the SAME session
    // (Spark merges touching windows; batch uses diff > gap)
    assert(EventStream.sessionizeBatch(events, 30).count() == 1L)
    assert(EventStream.sessionizeBuiltin(events, 30).count() == 1L)
    // one second past the gap splits in both forms
    val past = Seq((1L, t0, 1L, 1.0), (1L, t2, 2L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    assert(EventStream.sessionizeBatch(past, 30).count() == 2L)
    assert(EventStream.sessionizeBuiltin(past, 30).count() == 2L)
  }

  test("STREAMING session_window under a watermark equals the batch sessionizer") {
    // the native operator in its streaming form: append mode emits a
    // session only once the watermark passes its end; the staged
    // far-future sentinel rows advance the watermark so every real
    // session flushes (their own negative-user sessions are dropped)
    val (staged, schema) = EventStream.stagedEventsWithSentinel(spark, sf)
    // truncate BEFORE the watermark: session_window must key on the
    // watermarked column itself (a derived expression loses the tag)
    val base = TpchGraph.normalizeTs(
        spark.readStream.schema(schema).parquet(staged.getAbsolutePath))
      .withColumn("ts", date_trunc("second", col("ts")))
      .withWatermark("ts", "0 seconds")
    val name = "graft_stream_session_window"
    val q = base
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select("user_id", "session_start", "n_events", "sum_value")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStream.sessionizeBuiltin(TpchGraph.events(spark, sf), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("SHARDED batch sessionization == plain under aggressive sharding") {
    val events = TpchGraph.events(spark, sf)
    val plain = EventStream.sessionizeBatch(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // threshold 0 makes EVERY user hot; shard sizes at, below, and far
    // above the gap all reconstruct the identical session partition
    for (shardMin <- Seq(7, 30, 1440)) {
      val sharded = EventStream.sessionizeBatchSharded(events, gapMinutes = 30,
          hotThreshold = 0L, shardMinutes = shardMin)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(sharded == plain, s"shardMinutes=$shardMin")
    }
    assert(plain.nonEmpty)
  }

  test("SHARDED sessionization boundary: chains across shard edges stitch back") {
    import java.sql.Timestamp
    def ev(uid: Long, s: String, id: Long, v: Double) =
      (uid, Timestamp.valueOf(s), id, v)
    // shard size 60 min, gap 30 min. User 1: a 5-event chain at 20-min
    // spacing crossing TWO shard boundaries (00:50 → 01:10 crosses 01:00,
    // 01:50 → 02:10 crosses 02:00) must come back as ONE session.
    // User 2: an event EXACTLY on a shard boundary (02:00:00) 20 min
    // after its predecessor joins the same session. User 3: a gap of
    // exactly 1800 s across a boundary still merges (the > gap rule);
    // user 4: 1801 s across a boundary splits.
    val events = Seq(
      ev(1L, "2026-01-01 00:50:00", 1, 1.0), ev(1L, "2026-01-01 01:10:00", 2, 1.0),
      ev(1L, "2026-01-01 01:30:00", 11, 1.0),
      ev(1L, "2026-01-01 01:50:00", 3, 1.0), ev(1L, "2026-01-01 02:10:00", 4, 1.0),
      ev(2L, "2026-01-01 01:40:00", 5, 1.0), ev(2L, "2026-01-01 02:00:00", 6, 1.0),
      ev(3L, "2026-01-01 00:45:00", 7, 1.0), ev(3L, "2026-01-01 01:15:00", 8, 1.0),
      ev(4L, "2026-01-01 00:44:59", 9, 1.0), ev(4L, "2026-01-01 01:15:00", 10, 1.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = EventStream.sessionizeBatchSharded(events, gapMinutes = 30,
        hotThreshold = 0L, shardMinutes = 60)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList.sorted
    assert(got == List(
      (1L, "2026-01-01 00:50:00", 5L),
      (2L, "2026-01-01 01:40:00", 2L),
      (3L, "2026-01-01 00:45:00", 2L),
      (4L, "2026-01-01 00:44:59", 1L), (4L, "2026-01-01 01:15:00", 1L)), got.toString)
    // and the plain form agrees on the same fixture
    val plain = EventStream.sessionizeBatch(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList.sorted
    assert(got == plain)
  }

  test("SHARDED streaming timeout sessionization == batch at sub-gap shard size") {
    // shardMinutes 20 < gap 30: every open-at-boundary local session
    // exercises the merge, and the drained answer must still equal the
    // plain batch sessionizer
    val batch = EventStream.sessionizeBatch(TpchGraph.events(spark, sf), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = EventStream.runSessionTimeoutStream(spark, sf, gapMinutes = 30,
        shardMinutes = 20)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("event-time-timeout sessionization equals the batch answer") {
    val batch = EventStream.sessionizeBatch(TpchGraph.events(spark, sf), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = EventStream.runSessionTimeoutStream(spark, sf, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("hourly agg batch == streaming (complete-mode memory sink)") {
    val streamed = EventStream.runHourlyStream(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.hourlyAgg(TpchGraph.events(spark, sf))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventStream.runIntervalJoinStream(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val ev = TpchGraph.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    val batch = v.join(p,
        col("v_user") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("interval 10 minutes"))
      .groupBy(date_format(col("purchase_ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("p_user")).as("n_users"),
        sum(round(col("value") * 1000).cast("long")).as("sum_value_milli"))
      .orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join equals the batch left join, including the last view") {
    val streamed = EventStream.runIntervalLeftJoinStream(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val ev = TpchGraph.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    val batch = v.join(p,
        col("v_user") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("interval 10 minutes"),
        "left_outer")
      .groupBy(date_format(col("view_ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("purchase_ts")).as("n_matched"),
        (count(lit(1)) - count(col("purchase_ts"))).as("n_unmatched"),
        coalesce(sum(round(col("value") * 1000).cast("long")), lit(0L))
          .as("sum_value_milli"))
      .orderBy("day")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(streamed == batch && batch.nonEmpty)
    // unmatched rows exist — the watermark-dependent half is exercised
    assert(batch.map(_._4).sum > 0)
    // the LAST day's views are fully accounted for: this is the case the
    // per-type sentinel fixes (a single-type sentinel advances only one
    // filtered leg's watermark, and the min-policy global watermark then
    // strands the final view in join state forever)
    assert(streamed.map(t => t._2).sum == v.count())
  }

  test("availableNow twin: two production-style runs over one checkpoint drain the left-outer join identically") {
    import org.apache.spark.sql.streaming.Trigger
    // the production trigger path: each run is Trigger.AvailableNow over
    // whatever files exist, state carries across runs via the
    // checkpoint, and NO in-run drain sentinel exists — the next run's
    // naturally-later data advances the watermark and evicts held state
    // (exactly how a periodic batch-of-streams job drains in
    // production). The staged per-type far-future file stands in for
    // "the next day's arrivals".
    val (staged, schema) = EventStream.stagedEventsWithSentinel(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-an-src").toFile
    val out = java.nio.file.Files.createTempDirectory("graft-an-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-an-ckpt").toString
    def stage(name: String): Unit =
      java.nio.file.Files.copy(
        new java.io.File(staged, name).toPath,
        new java.io.File(dir, name).toPath)
    def runOnce(): Unit = {
      val base = TpchGraph.normalizeTs(
        spark.readStream.schema(schema).parquet(dir.getAbsolutePath))
        .withWatermark("ts", "0 seconds")
      val views = base.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("value"))
      val q = views.join(purchases,
          col("v_user") === col("p_user") &&
            col("purchase_ts") >= col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("interval 10 minutes"),
          "left_outer")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stage("00_events.parquet")
    runOnce() // run 1: events only — sentinel-free, like production
    stage("01_sentinel.parquet")
    runOnce() // run 2: picks up ONLY the new file from the checkpoint
    val drained = spark.read.parquet(out)
      .filter(col("v_user") >= 0) // the stand-in rows' own join output
      .groupBy(date_format(col("view_ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("purchase_ts")).as("n_matched"),
        (count(lit(1)) - count(col("purchase_ts"))).as("n_unmatched"),
        coalesce(sum(round(col("value") * 1000).cast("long")), lit(0L))
          .as("sum_value_milli"))
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val viaSentinelHarness = EventStream.runIntervalLeftJoinStream(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(drained == viaSentinelHarness && drained.nonEmpty)
    assert(drained.map(_._4).sum > 0) // unmatched rows drained across runs
  }

  test("stream-static enrichment join equals the batch join and stays stateless") {
    val streamed = EventStream.runStreamStaticJoin(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val batch = TpchGraph.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 1000).cast("long")).as("sum_value_milli"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
