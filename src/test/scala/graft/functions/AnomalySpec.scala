package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // entity 1: a flat baseline of 1.0s, then a spike; entity 2: too short
  private def events = {
    val flat = (0L until 10L).map(i => (i, 1L, i, 1.0))
    val spike = Seq((10L, 1L, 10L, 5.0))        // 5.0 vs flat window → flagged
    val calm = Seq((11L, 1L, 11L, 1.0))         // window now has the spike: var > 0
    val short = (20L until 25L).map(i => (i, 2L, i, 100.0)) // < window history
    (flat ++ spike ++ calm ++ short).toDF("event_id", "entity_id", "ts", "value")
  }

  private def flags = Anomaly.kSigmaFlags(events, col("event_id"),
    col("entity_id"), col("ts"), col("value"), window = 10, k = 2)

  test("flags the spike, never short-history rows; zero-variance baseline flags any move") {
    val got = flags.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // event 10: window = ten 1.0s → S=10000, SS=10^7, var=0, dev=10*5000-10000≠0 → flagged
    assert(got.map(_._1) == Seq(10L), got.toString)
    assert(got.head._2 == 5000L && got.head._3 == 10000L)
    // event 11 (v=1.0): window has the spike → mean 1.4, σ≈1.2 → |1-1.4| < 2σ → clean
    // entity 2 rows: only 5 of history → cnt < 10 → never evaluated
  }

  test("flag set is partitioning-independent (exact integer test)") {
    val a = flags.collect().map(_.getLong(0)).toSet
    val b = Anomaly.kSigmaFlags(events.repartition(7), col("event_id"),
        col("entity_id"), col("ts"), col("value"), window = 10, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("rejects values beyond the 64-bit-exact bound instead of wrapping silently") {
    // |v_milli| bound for (window=10, k=2) is 3.03e9/20 = 1.515e8 → raw 151500.
    val huge = (0L until 11L).map(i => (i, 1L, i, 2.0e5)).toDF("event_id", "entity_id", "ts", "value")
    val e = intercept[Exception] {
      Anomaly.kSigmaFlags(huge, col("event_id"), col("entity_id"), col("ts"),
        col("value"), window = 10, k = 2).collect()
    }
    assert(e.getMessage.contains("64-bit-exact bound"), e.getMessage)
    // just inside the bound: runs clean (zero-variance baseline → no flags on flat data)
    val ok = (0L until 11L).map(i => (i, 1L, i, 1.5e5)).toDF("event_id", "entity_id", "ts", "value")
    Anomaly.kSigmaFlags(ok, col("event_id"), col("entity_id"), col("ts"),
      col("value"), window = 10, k = 2).collect()
  }

  test("PROPERTY: matches a naive per-entity scan on random walks") {
    val rng = new scala.util.Random(20260813L)
    val rows = (0 until 400).map { i =>
      (i.toLong, (i % 4).toLong, i.toLong, math.floor(rng.nextGaussian() * 500) / 1000.0 + 1.0)
    }
    val got = Anomaly.kSigmaFlags(rows.toDF("event_id", "entity_id", "ts", "value"),
        col("event_id"), col("entity_id"), col("ts"), col("value"), window = 10, k = 2)
      .collect().map(_.getLong(0)).toSet
    val want = rows.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._1))
      sorted.indices.filter { i =>
        i >= 10 && {
          val win = sorted.slice(i - 10, i).map(e => math.round(e._4 * 1000))
          val v = math.round(sorted(i)._4 * 1000)
          val s = win.sum; val ss = win.map(x => x * x).sum
          val dev = 10 * v - s
          dev * dev > 4 * (10 * ss - s * s)
        }
      }.map(sorted(_)._1)
    }.toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
  }

  test("cusumAlarm prefix form == Page's sequential recursion; sustained shift alarms") {
    import java.sql.Timestamp
    // 4 quiet hours of 10 events, then 4 hot hours of 18: a shift no
    // single bucket would flag point-wise, but CUSUM accumulates
    val counts = Seq(10, 10, 10, 10, 18, 18, 18, 18)
    val rows = counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i =>
        (h.toLong * 1000 + i, Timestamp.valueOf(f"2024-01-01 ${h}%02d:15:00")))
    }
    val df = rows.toDF("event_id", "ts")
    val got = Anomaly.cusumAlarm(df, col("ts"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    // mean = 112 div 8 = 14, slack = 0; sequential S_t = max(0, S+x-14)
    var s = 0L
    val want = counts.map { n => s = math.max(0L, s + n - 14); (n.toLong, s, if (s > 14) 1 else 0) }
    assert(got == want)
    assert(got.last._3 == 1 && got.take(4).forall(_._3 == 0))
  }
}
