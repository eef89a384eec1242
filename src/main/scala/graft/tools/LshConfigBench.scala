package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the [[graft.functions.Similarity.lshConfigFor]]
  * claim — that at production near-dup thresholds the corpus-derived
  * config beats the fixed default on CANDIDATE MASS (the quantity the
  * p102 profile prices) and wall-clock, at equal-or-better promised
  * recall. `runMain graft.tools.LshConfigBench [sfDir] [minCos]`.
  *
  * Prints, for the fixed (4, 6) config and the derived one: the derived
  * parameters, Σ-occupancy candidate mass measured from the ACTUAL
  * bucket profile (not the uniform estimate), surviving pair count, and
  * min-of-2 wall time of the full pair generation.
  */
object LshConfigBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1.0")
    val minCos = if (args.length > 1) args(1).toDouble else 0.9
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val n = emb.count()

    /** The PRE-round-9 pair-generation shape (candidate ids → distinct →
      * two vector-fetch joins → verify), kept runnable so the
      * verify-inline win stays measurable on any corpus — same pair set
      * as the inline form by construction.
      */
    def legacyPairs(planes: Int, tables: Int): Long = {
      val data = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val bucketed = (0 until tables).map { t =>
        val pl = graft.functions.Similarity.hyperplanes(planes, dim, seed = 7L + t)
        val bucket = pl.zipWithIndex.map { case (p, i) =>
          graft.functions.Similarity.signBit(col("v"), p, i)
        }.reduce((a, b) => a.bitwiseOR(b))
        data.select(col("id"), lit(t).as("tbl"), bucket.as("bucket"))
      }.reduce(_ unionByName _)
      val l = bucketed.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      val r = bucketed.select(col("tbl"), col("bucket"), col("id").as("id_b"))
      val cands = l.join(r, Seq("tbl", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      cands
        .join(data.select(col("id").as("id_a"), col("v").as("va")), "id_a")
        .join(data.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
        .withColumn("cos",
          round(graft.functions.Similarity.cosine(col("va"), col("vb")), 6))
        .filter(col("cos") >= minCos)
        .count()
    }

    def measure(label: String, planes: Int, tables: Int,
                pairsOf: (Int, Int) => Long): Unit = {
      val mass = graft.functions.Dedup
        .lshOccupancyProfile(emb, col("embedding"), dim, planes, tables)
        .agg(sum(col("sum_sq"))).head().getLong(0)
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val pairs = pairsOf(planes, tables)
        ((System.nanoTime() - t0) / 1e9, pairs)
      }
      val (t1, c1) = once(); val (t2, c2) = once()
      require(c1 == c2)
      println(f"[lshcfg] $label planes=$planes tables=$tables " +
        f"candidate_mass=$mass%,d pairs=$c1%,d time=${math.min(t1, t2)}%.2f s")
    }

    def inlinePairs(planes: Int, tables: Int): Long =
      graft.functions.Dedup.embeddingNearDupsLsh(
        emb, col("vec_id"), col("embedding"), minCos, dim, planes, tables).count()

    println(s"[lshcfg] n=$n dim=$dim minCos=$minCos sfDir=$sfDir")
    val (dp, dt) = graft.functions.Similarity.lshConfigFor(n, minCos)
    measure("legacy ", 4, 6, legacyPairs)
    measure("fixed  ", 4, 6, inlinePairs)
    measure("derived", dp, dt, inlinePairs)
    spark.stop()
  }
}
