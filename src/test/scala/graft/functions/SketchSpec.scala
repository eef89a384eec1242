package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("small groups (< k distinct) report exactly; estimate tracks large groups within KMV error") {
    val k = 64
    // group "small": 10 distinct values; "big": 5000 distinct values
    val rows = (1 to 10).map(i => ("small", s"s$i")) ++
      (1 to 5000).map(i => ("big", s"b$i")) ++
      (1 to 5000).map(i => ("big", s"b$i"))  // duplicates must not inflate
    val out = Sketch.kmvDistinct(rows.toDF("g", "v"), col("g"), col("v"), k)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("small") == ((10L, 10L)))
    val (exact, est) = out("big")
    assert(exact == 5000L)  // no 28-bit collisions at this size/seed
    // expected relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 3x margin
    assert(math.abs(est - exact).toDouble / exact < 0.38, s"est=$est exact=$exact")
  }

  test("estimate is partition-invariant (the sketch merges, it doesn't sample)") {
    val rows = (1 to 3000).map(i => ("g", s"v$i"))
    def run(parts: Int) =
      Sketch.kmvDistinct(rows.toDF("g", "v").repartition(parts), col("g"), col("v"), 32)
        .collect()(0).getLong(2)
    assert(run(1) == run(7) && run(7) == run(32))
  }
}
