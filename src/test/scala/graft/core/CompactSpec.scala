package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses per-partition files to one and preserves content exactly") {
    val base = TempStores.scratchDir("graft_compact_spec").toString
    val rows = (1 to 300).map(i => (i.toLong, s"s${i % 4}", i * 10L))
    val df = rows.toDF("id", "source", "v")
    // three appends fragment each of the 4 partitions
    Seq(0, 1, 2).foreach { w =>
      df.filter(col("id") % 3 === w)
        .write.mode("append").partitionBy("source").parquet(s"$base/raw")
    }
    val before = Compact.dataFileCount(s"$base/raw")
    assert(before >= 12, s"expected >= 3 files per partition, got $before")

    Compact.compact(spark, s"$base/raw", s"$base/compact", "source")
    val after = Compact.dataFileCount(s"$base/compact")
    assert(after == 4, s"expected exactly 1 file per partition, got $after")

    val got = spark.read.parquet(s"$base/compact")
      .select("id", "source", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == rows.toSet)
  }
}
