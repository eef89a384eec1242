package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave (bit-by-bit, driver-side). */
  private def refZ(u: Long, v: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((u >> i) & 1L) << (2 * i)) | (((v >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zorderValue matches the reference interleave bit-for-bit") {
    val rng = new scala.util.Random(84L)
    val pts = Seq.fill(500)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = pts.toDF("u", "v")
      .select(col("u"), col("v"), Layout.zorderValue(col("u"), col("v"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (u, v) =>
      assert(got((u, v)) == refZ(u, v, 8), s"($u,$v)")
    }
    // round-trip: the map is injective on the full 8-bit grid
    val all = for (u <- 0L until 256L by 17; v <- 0L until 256L by 13) yield (u, v)
    assert(all.map { case (u, v) => refZ(u, v, 8) }.distinct.size == all.size)
  }

  test("Z-ordered files cover quadrant-shaped boxes; a u-sorted layout spans full v") {
    val dims = graft.sources.TpchGraph.events(spark, sf)
      .select(pmod(col("user_id"), lit(256)).cast("long").as("u"),
        ((hour(col("ts")) * 60 + minute(col("ts"))) / lit(10)).cast("long").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    dir.deleteOnExit()
    val zPath = s"$dir/z"

    Layout.writeZordered(dims, Layout.zorderValue(col("u"), col("v"), 8), zPath, 64)

    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(col("_metadata.file_name"))
      .agg((max("u") - min("u")).as("du"), (max("v") - min("v")).as("dv"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val zBoxes = boxes(zPath)
    val fullArea = 256.0 * 144.0
    val zArea = zBoxes.map { case (du, dv) => (du + 1.0) * (dv + 1.0) }.sum / zBoxes.size
    // 64 files over a 16-bit Z-space = 1024-cell tiles (32x32); allow 6x
    // slack for range-boundary straddle and sparse data
    assert(zArea < 0.17 * fullArea, s"mean z-file box area $zArea vs full $fullArea")

    // contrast: sorting by u alone leaves every file spanning ~all of v
    val uPath = s"$dir/u"
    dims.repartitionByRange(64, col("u")).sortWithinPartitions("u")
      .write.mode("overwrite").parquet(uPath)
    val uBoxes = boxes(uPath)
    val uDv = uBoxes.map(_._2).max
    assert(uDv > 100, s"u-sorted layout should span v (got max dv=$uDv)")
    assert(spark.read.parquet(zPath).count() == dims.count())
  }
}
