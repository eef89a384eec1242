package graft.streaming

import graft.SparkSpec

/** The 100 TB deployment answer for streaming state: the default
  * HDFS-backed provider keeps every key's state ON HEAP (fine for the
  * tens-of-keys gate streams, fatal at billions of dedup keys); the
  * RocksDB provider keeps state off-heap/on-disk with incremental
  * checkpointing and is one config away. These tests run the same
  * maintained-store queries under
  * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`
  * and require the drained output to be IDENTICAL to the default
  * provider's — the state backend is an operational choice, never a
  * semantic one. (rocksdbjni ships in the Spark distribution.)
  */
class RocksDbStateStoreSpec extends SparkSpec {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("hourly windowed aggregation (p12 surface) drains identically under RocksDB") {
    val want = EventStream.runHourlyStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    val got = withRocksDb(EventStream.runHourlyStream(spark, sf))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("watermarked stream dedup (p108 surface) drains identically under RocksDB") {
    val want = EventStream.runDistinctWithinWatermarkStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    val got = withRocksDb(EventStream.runDistinctWithinWatermarkStream(spark, sf))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  // The arbitrary-state operators are where providers actually diverge:
  // flatMapGroupsWithState round-trips USER-DEFINED state through the
  // store (encoder bytes, timeout timestamps), and session_window uses
  // the dedicated merging session store path — both exercise provider
  // code the built-in aggregation/dedup surfaces above never touch.

  test("event-time-timeout sessionization (p111, flatMapGroupsWithState) drains identically under RocksDB") {
    val want = EventStream.runSessionTimeoutStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    val got = withRocksDb(EventStream.runSessionTimeoutStream(spark, sf))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("built-in session_window aggregation (p139 surface) drains identically under RocksDB") {
    val want = EventStream.runSessionWindowStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    val got = withRocksDb(EventStream.runSessionWindowStream(spark, sf))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("stream-stream interval join (p82 surface) drains identically under RocksDB") {
    // symmetric join state (both sides buffered until the watermark
    // clears the interval) — the third provider-backed state shape
    val want = EventStream.runIntervalJoinStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    val got = withRocksDb(EventStream.runIntervalJoinStream(spark, sf))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  // NOT under this spec, deliberately: the maintained-store dedup (p58)
  // and kNN store (p155) keep their state as PARQUET TABLES the queries
  // own (the lakehouse-artifact form), not in the streaming state store
  // — there is no provider to vary; their correctness gates are the
  // oracle queries themselves.
}
