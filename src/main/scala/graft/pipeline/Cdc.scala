package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance of a standing corpus — the
  * merge-into every long-lived training-data table needs: crawls,
  * re-crawls, and takedowns arrive as a versioned feed of upserts and
  * tombstones, and the corpus any downstream operator reads is
  * "latest version wins, tombstone removes".
  *
  * Scale shape: compaction is ONE hash aggregation on the key
  * (`max_by` over a (version, tombstone-rank) order), map-side
  * combined — no window, no global sort, no join. The aggregate is
  * associative and idempotent, so the same operator serves one-shot
  * compaction, wave-merged incremental maintenance (compact the old
  * snapshot unioned with the delta — the p101/p114 store pattern), and
  * arbitrary re-partitioning: `compact(compact(a ∪ b) ∪ c) =
  * compact(a ∪ b ∪ c)` by construction.
  */
object Cdc {

  /** Compact a change feed to the surviving standing corpus.
    *
    * `feed` carries the payload columns plus `key`, `version` (higher
    * wins), and `op` (`"upsert"` | `"delete"`). At equal version a
    * delete outranks an upsert (the deterministic tie — a feed should
    * not produce one, but replay/backfill overlap can). A delete only
    * masks versions at or below it: a LATER upsert resurrects the key
    * — takedown-then-recrawl is a real sequence, not an anomaly.
    * Returns the feed's columns for each surviving key at its winning
    * version.
    *
    * `keepTombstones = true` returns the winning DELETE rows too — the
    * form an INCREMENTAL snapshot must store: dropping a tombstone
    * from the snapshot forgets that the key was deleted, and a
    * late-arriving lower-version upsert in a later delta would wrongly
    * resurrect it. Readers filter `op != 'delete'`; the maintained
    * snapshot never does.
    */
  def compact(feed: DataFrame, key: Column, version: Column, op: Column,
              keepTombstones: Boolean = false): DataFrame = {
    val opRank = when(op === "delete", 1).otherwise(0)
    val winner = feed
      .groupBy(key.as("_k"))
      .agg(max_by(struct(col("*")), struct(version, opRank)).as("w"))
      .select(col("w.*"))
    if (keepTombstones) winner else winner.filter(op =!= "delete")
  }

  /** Time travel, all versions at once: the snapshot the corpus
    * presented at EVERY `as_of` in `[0, maxVersion]` — the read-as-of
    * semantics of a versioned table (Delta/Iceberg time travel),
    * computed in ONE aggregation instead of one compaction per version.
    *
    * Each change row is a winner candidate for exactly the snapshots
    * `as_of ≥ version`, so the feed explodes by that bounded factor
    * (the VERSION count — single digits in practice, never corpus- or
    * key-sized) and one map-side-combined `max_by` per `(as_of, key)`
    * picks every snapshot's winner simultaneously. Same order as
    * [[compact]]: higher version wins, delete outranks upsert at equal
    * version, later upserts resurrect.
    *
    * Returns `as_of` plus the feed's columns for each key LIVE at that
    * snapshot (tombstone winners are dropped — this is the reader view;
    * audits that need deletion counts aggregate before the filter).
    */
  def snapshotAll(feed: DataFrame, key: Column, version: Column, op: Column,
                  maxVersion: Long): DataFrame = {
    require(maxVersion >= 0, s"maxVersion must be non-negative: $maxVersion")
    val opRank = when(op === "delete", 1).otherwise(0)
    val payload = struct(feed.columns.map(col).toIndexedSeq: _*)
    feed
      // rows from versions AFTER the requested horizon are not-yet-born at
      // every as_of in [0, maxVersion] — without this bound, sequence(v,
      // maxVersion) on v > maxVersion generates a DESCENDING range and a
      // future row leaks into (and wins) snapshots it did not exist in
      .filter(version.cast("long") <= maxVersion)
      .select(key.as("_k"), payload.as("_p"), version.as("_v"), opRank.as("_r"),
        explode(sequence(version.cast("long"), lit(maxVersion))).as("as_of"))
      .groupBy(col("as_of"), col("_k"))
      .agg(max_by(col("_p"), struct(col("_v"), col("_r"))).as("w"))
      .select(col("as_of"), col("w.*"))
      .filter(op =!= "delete")
  }
}
