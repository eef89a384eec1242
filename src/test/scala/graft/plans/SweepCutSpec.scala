package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SweepCutSpec extends SparkSpec {
  import spark.implicits._

  private def bothDirections(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("sweep finds the seed's triangle across the bridge at conductance 1/7") {
    // two triangles {1,2,3} and {4,5,6} joined by bridge 3-4; seed 1.
    // prefix {1,2,3}: vol=7 (2+2+3), cut=1 (the bridge), min(7,14-7)=7
    // ⇒ φ = 142857 ppm — the sweep's global minimum
    val e = bothDirections(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)))
    val rows = SweepCut.localCommunity(e, col("key") === 1L,
        iters = 3, maxPrefix = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 6))
    // the first three sweep positions are exactly the seed triangle
    assert(rows.take(3).map(_._2).toSet == Set(1L, 2L, 3L))
    val k3 = rows(2)
    assert((k3._3, k3._4, k3._5) == ((7L, 1L, 142857L)))
    // ... and it is the unique conductance minimum of the sweep
    assert(rows.map(_._5).min == 142857L)
    assert(rows.count(_._5 == 142857L) == 1)
    // the full-graph prefix hits the half-volume guard
    assert(rows(5)._3 == 14L && rows(5)._5 == 1000000L)
  }

  test("validates parameters") {
    val e = bothDirections(Seq((1L, 2L)))
    intercept[IllegalArgumentException] {
      SweepCut.localCommunity(e, col("key") === 1L, iters = 0, maxPrefix = 5)
    }
    intercept[IllegalArgumentException] {
      SweepCut.localCommunity(e, col("key") === 1L, iters = 1, maxPrefix = 0)
    }
  }
}
