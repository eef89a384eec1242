package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest of the `events` table (the reference has no
  * streaming surface — SURVEY §2.9 — so this is the engine's
  * streaming-shaped extension: append-only event ingest with windowed
  * aggregation and watermarking).
  *
  * The same transformation runs identically on a batch DataFrame (the
  * Dataset API is the unifying layer); the local smoke path drives a
  * bounded parquet file through a memory sink with
  * `processAllAvailable()`.
  */
object EventStream {

  /** Hourly tumbling-window counts + value sums per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Run [[hourlyAgg]] as a real streaming query over the parquet file,
    * complete-mode memory sink, synchronously drained. Returns the final
    * result table (identical to the batch answer — verified by the
    * DuckDB oracle).
    */
  /** `sfDir` is the directory holding `events.parquet` — the file-stream
    * source requires a directory path, so glob-filter within it.
    */
  def runHourlyStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    val name = "graft_stream_hourly"
    val q = hourlyAgg(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy("hour_start", "event_type")
  }
}
