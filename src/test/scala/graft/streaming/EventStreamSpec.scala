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

  test("hourly agg batch == streaming (complete-mode memory sink)") {
    val streamed = EventStream.runHourlyStream(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.hourlyAgg(TpchGraph.events(spark, sf))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
