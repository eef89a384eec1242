package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized equivalence tests for the two riskiest custom pieces:
  * the heap-based top-k operator (vs the window idiom it replaces) and
  * star-contraction connected components (vs GraphX). Deterministic
  * seeds — failures reproduce.
  */
class RandomizedEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("property: TopKPerGroup equals the row_number window answer on random data") {
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val nRows = 200 + rng.nextInt(800)
      val nGroups = 1 + rng.nextInt(12)
      val k = 1 + rng.nextInt(5)
      // duplicate scores force tie handling; (score, id) stays total
      val rows = (0 until nRows).map(i => (rng.nextInt(nGroups), i, rng.nextInt(50)))
      val df = rows.toDF("g", "id", "score")
      val viaTopK = TopKPerGroup.topK(df, Seq(col("g")), struct(col("score"), col("id")), k)
        .collect().map(_.toSeq).toSet
      val viaWindow = df.withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy(struct($"score", $"id").desc)))
        .filter($"rn" <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(viaTopK == viaWindow, s"seed=$seed nRows=$nRows nGroups=$nGroups k=$k")
    }
  }

  test("property: DfConnectedComponents equals GraphX CC on random graphs") {
    import org.apache.spark.graphx.{Edge, Graph}
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(100 + seed)
      val nVerts = 5 + rng.nextInt(55)
      val nEdges = rng.nextInt(120) // may leave isolated vertices / be empty
      val edges = (0 until nEdges).map(_ =>
        (rng.nextInt(nVerts).toLong, rng.nextInt(nVerts).toLong)) // self-loops allowed
      val viaDf = DfConnectedComponents.run(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // run() contracts to vertices on NON-loop edges; align the GraphX side
      val touched = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2)).distinct
      if (touched.isEmpty) assert(viaDf.isEmpty, s"seed=$seed")
      else {
        val gx = Graph(
          spark.sparkContext.parallelize(touched.map(v => (v, v))),
          spark.sparkContext.parallelize(edges.filter(e => e._1 != e._2)
            .map(e => Edge(e._1, e._2, ()))))
        val viaGx = gx.connectedComponents().vertices.collect().toMap
        assert(viaDf == viaGx, s"seed=$seed nVerts=$nVerts nEdges=$nEdges")
      }
    }
  }
}
