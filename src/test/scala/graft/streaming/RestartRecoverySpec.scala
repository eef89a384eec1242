package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpoint restart-recovery — the durability contract RocksDB (and the
  * HDFS provider) exist for in production, and the one axis r12's
  * provider-parity work left untested: every prior drain ran
  * start-to-finish in one process. Each test stops the query after the
  * state-building events batch COMMITS (all sessions open / all window
  * partials live in the checkpoint), restarts the same definition from
  * that checkpoint, lets the sentinel batch flush, and requires the
  * two-incarnation file-sink output to equal the uninterrupted run's —
  * under BOTH state store providers.
  */
class RestartRecoverySpec extends SparkSpec {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[T](provider: Option[String])(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    provider match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def assertRecovers(build: DataFrame => DataFrame): Unit =
    for (provider <- Seq(None, Some(RocksDb))) withProvider(provider) {
      val want = sorted(RestartRecovery.run(spark, sf, interrupt = false)(build))
      val got = sorted(RestartRecovery.run(spark, sf, interrupt = true)(build))
      assert(want.nonEmpty, s"reference run empty (provider=$provider)")
      assert(got == want, s"restart output diverges (provider=$provider)")
    }

  test("p111 flatMapGroupsWithState sessionization recovers user state across a restart") {
    // all sessions are OPEN at the stop point (the sentinel batch is the
    // only watermark advance), so every group's encoder-serialized state
    // and timeout timestamp must round-trip through the checkpoint
    assertRecovers(ev => EventStream.sessionTimeoutPipeline(spark, ev).toDF())
  }

  test("SHARDED sessionization pipeline recovers (user, shard) state across a restart") {
    // the hot-key-safe p111 production path: state keyed by (user,
    // time-shard) with the min(last+gap, shardEnd) timeout rule — the
    // tuple group key's encoder, the shard-end timeout timestamps, and
    // every open local session must round-trip through the checkpoint.
    // Sub-gap shard size (20 < 30 min) so boundary-open sessions are
    // plentiful at the stop point
    assertRecovers(ev => EventStream.sessionShardTimeoutPipeline(spark, ev,
      gapMinutes = 30, shardMinutes = 20).toDF())
  }

  test("p139 built-in session_window aggregation recovers merging-store state across a restart") {
    assertRecovers { ev =>
      ev.withColumn("ts", date_trunc("second", col("ts")))
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "1801 seconds").as("w"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("sum_value"))
    }
  }

  /** SIGKILL one executor JVM of THIS app and wait for the standalone
    * worker to relaunch a replacement. App-scoped via the driver port in
    * the executor command line, so a concurrent cluster run on the box
    * is never the victim.
    */
  private def killOneExecutorAndAwaitRelaunch(): Unit = {
    import scala.jdk.CollectionConverters._
    val port = spark.conf.get("spark.driver.port")
    def executors() = ProcessHandle.allProcesses().iterator().asScala.filter { ph =>
      val cmd = ph.info().commandLine().orElse("")
      cmd.contains("CoarseGrainedExecutorBackend") && cmd.contains(s":$port")
    }.toList
    val before = executors()
    assert(before.nonEmpty, "no executor JVM of this app found to kill")
    before.head.destroyForcibly()
    val deadline = System.currentTimeMillis() + 90000L
    while (executors().size < before.size && System.currentTimeMillis() < deadline)
      Thread.sleep(500L)
    assert(executors().size >= before.size,
      "worker did not relaunch a replacement executor within 90 s")
  }

  test("executor death between incarnations: state survives process AND executor loss") {
    // r13 proved restart recovery and executor-kill survival SEPARATELY;
    // this composes them — incarnation one's executors (their RocksDB
    // working dirs, loaded state maps, shuffle files) are destroyed
    // before incarnation two starts, so the recovered output can only
    // come from the checkpoint. Real executor JVMs required: under
    // local[N] there is no process whose death could prove anything.
    assume(spark.sparkContext.master.startsWith("local-cluster"),
      "requires real executor JVMs (SPARK_GRAFT_MASTER=local-cluster[...])")
    val build: DataFrame => DataFrame =
      ev => EventStream.sessionTimeoutPipeline(spark, ev).toDF()
    for (provider <- Seq(None, Some(RocksDb))) withProvider(provider) {
      val want = sorted(RestartRecovery.run(spark, sf, interrupt = false)(build))
      val got = sorted(RestartRecovery.run(spark, sf, interrupt = true,
        betweenIncarnations = () => killOneExecutorAndAwaitRelaunch())(build))
      assert(want.nonEmpty, s"reference run empty (provider=$provider)")
      assert(got == want,
        s"restart+executor-death output diverges (provider=$provider)")
    }
  }

  test("p12 hourly windowed aggregation recovers window partials across a restart") {
    // append mode (unlike the gate query's complete-mode memory sink):
    // finalized windows flush exactly once across the two incarnations,
    // so a lost partial would surface as a missing or low row
    assertRecovers(ev => EventStream.hourlyAgg(ev))
  }
}
