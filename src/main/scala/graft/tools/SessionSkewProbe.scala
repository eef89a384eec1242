package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the r15-ask/r16-carryover sessionization A/B (verdict
  * ask #7): one hot user owns `hotShare` of the stream; time the plain
  * single-window recurrence against the (user, time-shard) split, and
  * pin result equality. Usage:
  * runMain graft.tools.SessionSkewProbe [nEvents] [hotShare] [cpus]
  */
object SessionSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotShare = args.lift(1).map(_.toDouble).getOrElse(0.05)
    val cpus = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one hot user (id 0) owns hotShare of events; the rest spread over
    // 100k users; timestamps spread over ~90 days so the hot user's
    // stream time-shards into ~90 day buckets
    val events = spark.range(n).select(
      col("id").as("event_id"),
      when(pmod(col("id"), lit(10000)) < lit((hotShare * 10000).toLong), lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(100000L)) + 1L).as("user_id"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id"), lit(7)),
        lit(90L * 86400))).as("ts"),
      (pmod(xxhash64(col("id"), lit(13)), lit(1000L)) / 100.0).as("value"))
      .localCheckpoint(true)
    println(s"[sesskew] n=$n hot rows=${events.filter(col("user_id") === 0).count()}")

    def t(label: String)(df: DataFrame): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[sesskew] $label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val plain = graft.streaming.EventStream.sessionizeBatch(events, gapMinutes = 30)
    t("plain-window")(plain)
    val sharded = graft.streaming.EventStream.sessionizeBatchSharded(
      events, gapMinutes = 30, hotThreshold = 100000L, shardMinutes = 1440)
    t("sharded")(sharded)

    val h = (df: DataFrame) => df.agg(count(lit(1)),
      sum(xxhash64(col("user_id"), col("session_start"), col("n_events")))).head()
    println(s"[sesskew] plain=${h(plain)} sharded=${h(sharded)}")
    spark.stop()
  }
}
