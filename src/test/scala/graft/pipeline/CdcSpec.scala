package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def feed(rows: (Long, String, Long, String)*) =
    rows.toDF("id", "payload", "version", "op")

  private def survivors(df: org.apache.spark.sql.DataFrame) =
    Cdc.compact(df, col("id"), col("version"), col("op"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("latest version wins; tombstone removes; later upsert resurrects") {
    val f = feed(
      (1L, "a0", 0L, "upsert"), (1L, "a1", 1L, "upsert"),          // plain update
      (2L, "b0", 0L, "upsert"), (2L, "", 1L, "delete"),            // takedown
      (3L, "c0", 0L, "upsert"), (3L, "", 1L, "delete"),
      (3L, "c2", 2L, "upsert"),                                    // resurrect
      (4L, "d0", 0L, "upsert"))                                    // untouched
    assert(survivors(f) == Set((1L, "a1", 1L), (3L, "c2", 2L), (4L, "d0", 0L)))
  }

  test("equal-version tie: delete outranks upsert (deterministic replay overlap)") {
    val f = feed((5L, "e0", 0L, "upsert"),
      (5L, "e1", 1L, "upsert"), (5L, "", 1L, "delete"))
    assert(survivors(f).isEmpty)
  }

  test("keepTombstones retains the winning delete — the incremental-store form") {
    val f = feed((6L, "f0", 0L, "upsert"), (6L, "", 1L, "delete"))
    val snap = Cdc.compact(f, col("id"), col("version"), col("op"),
        keepTombstones = true)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(snap == Set((6L, 1L, "delete")))
    // without the tombstone, a late-arriving v0 upsert would resurrect;
    // with it, recompacting (snapshot ∪ late delta) keeps the key dead
    val late = feed((6L, "f0-late", 0L, "upsert"))
    val merged = Cdc.compact(
      Cdc.compact(f, col("id"), col("version"), col("op"), keepTombstones = true)
        .unionByName(late),
      col("id"), col("version"), col("op"))
    assert(merged.isEmpty)
  }

  test("associative + idempotent: wave-merged snapshots equal one-shot compaction") {
    val all = feed(
      (1L, "a0", 0L, "upsert"), (1L, "a1", 1L, "upsert"),
      (2L, "b0", 0L, "upsert"), (2L, "", 1L, "delete"),
      (3L, "c0", 0L, "upsert"), (3L, "", 1L, "delete"), (3L, "c2", 2L, "upsert"))
    val oneShot = survivors(all)
    val w0 = all.filter(col("version") === 0)
    val w1 = all.filter(col("version") === 1)
    val w2 = all.filter(col("version") === 2)
    val s0 = Cdc.compact(w0, col("id"), col("version"), col("op"), keepTombstones = true)
    val s1 = Cdc.compact(s0.unionByName(w1), col("id"), col("version"), col("op"),
      keepTombstones = true)
    val s2 = Cdc.compact(s1.unionByName(w2), col("id"), col("version"), col("op"),
      keepTombstones = true)
    val waved = s2.filter(col("op") =!= "delete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(waved == oneShot)
  }

  test("snapshotAll: every as_of equals the per-version compaction of the prefix") {
    val all = feed(
      (1L, "a0", 0L, "upsert"), (1L, "a1", 1L, "upsert"),
      (2L, "b0", 0L, "upsert"), (2L, "", 1L, "delete"),
      (3L, "c0", 0L, "upsert"), (3L, "", 1L, "delete"), (3L, "c2", 2L, "upsert"),
      (4L, "d2", 2L, "upsert"))                       // key born at v2
    val got = Cdc.snapshotAll(all, col("id"), col("version"), col("op"), maxVersion = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val expect = (0L to 2L).flatMap { asOf =>
      Cdc.compact(all.filter(col("version") <= asOf),
          col("id"), col("version"), col("op"))
        .collect().map(r => (asOf, r.getLong(0), r.getString(1), r.getLong(2)))
    }.toSet
    assert(got == expect)
    // spot-check the history: v0 all live; v1 deletes 2 and 3; v2
    // resurrects 3 and births 4
    assert(got.filter(_._1 == 0L).map(_._2) == Set(1L, 2L, 3L))
    assert(got.filter(_._1 == 1L).map(_._2) == Set(1L))
    assert(got.filter(_._1 == 2L).map(_._2) == Set(1L, 3L, 4L))
  }

  test("snapshotAll: rows from versions beyond maxVersion are not-yet-born, not winners") {
    // key 5 arrives at v5 — a read as-of [0, 3] must never see it, and a
    // v5 UPDATE of key 1 must not shadow key 1's v1 value in history
    val all = feed(
      (1L, "a1", 1L, "upsert"), (1L, "a5", 5L, "upsert"),
      (5L, "e5", 5L, "upsert"))
    val got = Cdc.snapshotAll(all, col("id"), col("version"), col("op"), maxVersion = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 1L, "a1"), (2L, 1L, "a1"), (3L, 1L, "a1")))
  }

  test("snapshotAll validates maxVersion") {
    intercept[IllegalArgumentException] {
      Cdc.snapshotAll(feed((1L, "a", 0L, "upsert")),
        col("id"), col("version"), col("op"), maxVersion = -1)
    }
  }
}
