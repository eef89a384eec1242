package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the COST/RECALL trade of the table-cap backoff in
  * [[graft.functions.Similarity.lshConfigFor]] — the number SCALE.md's
  * p130 "watch" item was missing. The derived config holds promised
  * recall at 0.9 by RAISING the table count with corpus mass; when the
  * `maxTables = 64` cap binds, planes back off instead (occupancy grows
  * past target, candidate mass rises) — a cost-for-recall contract whose
  * empirical ceiling was never recorded. This measures it:
  * `runMain graft.tools.LshRecallBench [sfDir] [minCos]`.
  *
  * Ground truth is the EXACT rounded-cosine pair set incident to a
  * deterministic ~2000-vector sample (`vec_id % mod == 0`,
  * `mod = max(1, n/2000)`): the sample side broadcasts and crosses the
  * corpus once — O(sample · n · d), feasible at any rehearsal SF where
  * the full n²d brute force is not. LSH pairs are verified (cos ≥
  * minCos) so found ⊆ truth and recall = |found ∩ sample-incident| /
  * |truth|, no precision term needed.
  *
  * Measured rows: a table sweep at the CAPPED plane count (how much
  * recall each table buys), the capped config itself, and the UNCAPPED
  * config (what the contract would run if tables were free). Each row:
  * planes, tables, Σc² candidate mass from the real bucket profile,
  * pair count, recall, min-of-2 wall time.
  */
object LshRecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf4.0")
    val minCos = if (args.length > 1) args(1).toDouble else 0.4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{Dedup, Similarity}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val n = emb.count()
    val mod = math.max(1L, n / 2000L)

    // exact sample-incident ground truth, same rounded-cosine admission
    // as the LSH verify so boundary pairs agree
    val data = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", Similarity.norm(col("v")))
    val sample = data.filter(col("id") % mod === 0)
      .select(col("id").as("id_s"), col("v").as("vs"), col("nv").as("ns"))
    val truth = data.crossJoin(broadcast(sample))
      .filter(col("id") =!= col("id_s"))
      .filter(round(Similarity.dot(col("v"), col("vs")) / (col("nv") * col("ns")), 6)
        >= minCos)
      .select(least(col("id"), col("id_s")).as("id_a"),
        greatest(col("id"), col("id_s")).as("id_b"))
      .distinct().cache()
    val nTruth = truth.count()
    println(s"[lshrecall] n=$n dim=$dim minCos=$minCos mod=$mod truth_pairs=$nTruth")

    def measure(label: String, planes: Int, tables: Int): Unit = {
      val mass = Dedup.lshOccupancyProfile(emb, col("embedding"), dim, planes, tables)
        .agg(sum(col("sum_sq"))).head().getLong(0)
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = Dedup.embeddingNearDupsLsh(emb, col("vec_id"), col("embedding"),
          minCos, dim, planes, tables).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (t1, c1) = once(); val (t2, c2) = once()
      require(c1 == c2, s"nondeterministic pair count: $c1 vs $c2")
      val found = Dedup.embeddingNearDupsLsh(emb, col("vec_id"), col("embedding"),
          minCos, dim, planes, tables)
        .filter(col("id_a") % mod === 0 || col("id_b") % mod === 0)
        .select("id_a", "id_b").join(truth, Seq("id_a", "id_b"), "left_semi")
        .count()
      val recall = if (nTruth == 0) 1.0 else found.toDouble / nTruth
      println(f"[lshrecall] $label planes=$planes tables=$tables " +
        f"candidate_mass=$mass%,d pairs=$c1%,d recall=$recall%.4f " +
        f"time=${math.min(t1, t2)}%.2f s")
    }

    val (cp, ct) = Similarity.lshConfigFor(n, minCos)
    val (up, ut) = Similarity.lshConfigFor(n, minCos, maxTables = 1 << 20)
    // the table sweep at the capped plane count: the measured curve a
    // 100 TB operator picks tables from
    val sweep = Seq(8, 16, 32).filter(_ < ct)
    sweep.foreach(t => measure("sweep   ", cp, t))
    measure("capped  ", cp, ct)
    if ((up, ut) != ((cp, ct))) measure("uncapped", up, ut)
    else println("[lshrecall] cap does not bind at this n — capped == uncapped")
    spark.stop()
  }
}
