package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(0, 10000).toDF("id")

  test("hash sampling is deterministic and approximately at rate") {
    val a = Sampling.hashSample(ids, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    assert(a == b) // rerun → identical membership
    assert(math.abs(a.size - 1000) < 150, s"got ${a.size}")
    // nested property: a 5% sample is a subset of the 10% sample
    val c = Sampling.hashSample(ids, col("id"), 0.05).collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("tokenBudgetSelect keeps the quality-ranked prefix within budget") {
    val docs = Seq(
      // (id, stratum, n_tokens, quality) — budget 10 per stratum
      (0L, "a", 4, 0.9), (1L, "a", 4, 0.8), (2L, "a", 4, 0.7), (3L, "a", 1, 0.6),
      (4L, "b", 20, 0.9), (5L, "b", 5, 0.5)
    ).toDF("id", "src", "n", "q")
    val out = Sampling.tokenBudgetSelect(docs, col("id"), col("src"),
        col("n"), col("q"), budget = 10L)
      .orderBy("source", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSeq
    // stratum a: 0 (cum 4), 1 (cum 8); 2 would hit 12 > 10 and, greedily,
    // doc 3 after it is also out (cum 13). stratum b: 4 alone busts the
    // budget, so nothing is selected from it — the operator is a prefix
    // rule, not a knapsack
    assert(out == Seq((0L, "a", 4L), (1L, "a", 8L)))
  }

  test("splitColumn partitions every row into exactly one split at ~weights") {
    val withSplit = ids.withColumn("split",
      Sampling.splitColumn(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000) < 150, counts.toString)
    // membership is stable under repartitioning
    val again = withSplit.repartition(7).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("stratified sampling applies per-stratum rates; unknown strata drop") {
    val df = ids.withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("de"))
    val s = Sampling.stratifiedHashSample(df, col("id"), col("lang"),
      Map("en" -> 0.2, "fr" -> 0.9))
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("de")) // rate 0
    assert(math.abs(counts("en") - 1000) < 150, counts.toString)
  }

  test("bad split weights are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("shuffleOrder is a deterministic permutation, independent per salt") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    def order(salt: String, parts: Int) =
      Sampling.shuffleOrder(df.repartition(parts), col("id"), salt)
        .collect().map(_.getLong(0)).toSeq
    val a = order("e0:", 1)
    val b = order("e0:", 13)
    assert(a == b, "same salt must give the same order under any partitioning")
    assert(a.sorted == (0L until 500L), "output must be a permutation of the input")
    val c = order("e1:", 13)
    assert(a != c, "different salts must give different epoch orders")
    assert(c.sorted == (0L until 500L))
  }

  test("shardManifest partitions the corpus and its fingerprint detects membership drift") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, 3L + (i % 5))).toDF("id", "nt")
    val manifest = Sampling.shardManifest(docs, col("id"), col("nt"), shards = 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(manifest.keySet == Set(0, 1, 2, 3))
    assert(manifest.values.map(_._1).sum == 400L, "every doc lands in exactly one shard")
    assert(manifest.values.map(_._2).sum ==
      (0L until 400L).map(i => 3L + (i % 5)).sum)
    // partition-invariance: the manifest is a pure function of the multiset
    val again = Sampling.shardManifest(docs.repartition(17), col("id"), col("nt"), 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(again == manifest)
    // drop one doc: its shard's count AND fingerprint must both move
    val dropped = Sampling.shardManifest(
      docs.filter(col("id") =!= 123L), col("id"), col("nt"), 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3))).toMap
    val moved = manifest.map { case (s, v) => s -> (v._1, v._3) }
      .toSet.diff(dropped.toSet)
    assert(moved.size == 1, "exactly one shard's (count, fingerprint) changes")
  }

  test("weightedSample: deterministic, partition-invariant, weight-monotone across salts") {
    import spark.implicits._
    // 20 heavy items (w=50) among 180 light (w=1): 85% of total weight
    val docs = (1L to 200L).map(i => (i, if (i <= 20) 50.0 else 1.0)).toDF("id", "w")
    def run(parts: Int, salt: String) =
      Sampling.weightedSample(docs.repartition(parts), col("id"), col("w"), 30, salt)
        .collect().map(_.getLong(0)).toSeq
    assert(run(1, "s0:") == run(13, "s0:"), "partitioning must not change the sample")
    assert(run(4, "s0:") != run(4, "s1:"), "salts must draw independent samples")
    // across 20 independent salts the heavy items must dominate: uniform
    // sampling would pick ~3 of them per draw (60 total); ES ∝ weight
    // picks nearly all 20 every time
    val heavyPicks = (0 until 20).map(s => run(4, s"es$s:").count(_ <= 20L)).sum
    assert(heavyPicks > 200, s"heavy items under-sampled: $heavyPicks/600")
    // zero/negative weights are excluded, k caps the output
    val out = Sampling.weightedSample(
      Seq((1L, 0.0), (2L, -1.0), (3L, 2.0)).toDF("id", "w"), col("id"), col("w"), 5)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(3L))
  }

  test("clusterSplitColumn never splits a dup cluster; a doc-keyed split does") {
    import spark.implicits._
    // 200 clusters of 5 duplicates each, ids interleaved across clusters
    val docs = (0L until 1000L).map(i => (i, s"cluster_${i % 200}"))
      .toDF("doc_id", "fp")
    val byCluster = docs.select(col("fp"),
        Sampling.clusterSplitColumn(col("fp"), 0.8).as("split"))
      .groupBy("fp").agg(countDistinct(col("split")).as("sides"))
      .collect().map(_.getLong(1))
    assert(byCluster.forall(_ == 1L), "no cluster may straddle the split")
    // contrast: keying on the doc id straddles many clusters (the leak)
    val byDoc = docs.select(col("fp"),
        Sampling.clusterSplitColumn(col("doc_id"), 0.8).as("split"))
      .groupBy("fp").agg(countDistinct(col("split")).as("sides"))
      .collect().map(_.getLong(1))
    assert(byDoc.count(_ == 2L) > 50, "doc-keyed split must demonstrate the leak")
    // and the rate is roughly honored at cluster granularity
    val trainClusters = docs.select(col("fp"),
        Sampling.clusterSplitColumn(col("fp"), 0.8).as("split"))
      .filter(col("split") === "train").select("fp").distinct().count()
    assert(trainClusters > 130 && trainClusters < 190, s"got $trainClusters/200")
  }

  test("waterfillAllocation: exact water level, boundary behavior, no-cap regime") {
    import spark.implicits._
    // strata masses 10, 20, 100, 200 (total 330); budget 3/5 → 198.
    // Segments: k=3 is the first with prefix + n·r > B (30 + 100·2 = 230
    // > 198), so C = (198 − 30) div 2 = 84; allocation 10+20+84+84 = 198
    val docs = (
      (1 to 10).map(i => (s"a$i", "A")) ++ (1 to 20).map(i => (s"b$i", "B")) ++
        (1 to 100).map(i => (s"c$i", "C")) ++ (1 to 200).map(i => (s"d$i", "D"))
      ).zipWithIndex.map { case ((w, s0), i) => (i.toLong, w, s0) }
      .toDF("doc_id", "text", "src")
    val got = Sampling.waterfillAllocation(docs, col("src"), lit(1L),
        budgetNum = 3L, budgetDen = 5L)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == Seq(("A", 10L, 10L, false), ("B", 20L, 20L, false),
      ("C", 100L, 84L, true), ("D", 200L, 84L, true)))
    assert(got.map(_._3).sum == 330L * 3 / 5)
    // budget ≥ total → no cap, everything allocated, capped all false
    val free = Sampling.waterfillAllocation(docs, col("src"), lit(1L),
        budgetNum = 1L, budgetDen = 1L)
      .collect().map(r => (r.getLong(2), r.getBoolean(3), r.isNullAt(4)))
    assert(free.forall { case (_, capped, waterNull) => !capped && waterNull })
    assert(free.map(_._1).sum == 330L)
  }

  test("mixtureEpochs: exact integer sqrt, weights, and epoch counts") {
    import spark.implicits._
    // masses 100, 400, 2500 → isqrt 10, 20, 50; S = 80, B = 3000.
    // weights: round(1e6·10/80)=125000, 250000, 625000.
    // epochs: round(3000·125000/100)=3750000 (stratum A repeats 3.75×),
    //         round(3000·250000/400)=1875000, round(3000·625000/2500)=750000
    val masses = Seq(("A", 100L), ("B", 400L), ("C", 2500L)).toDF("stratum", "n")
    val got = Sampling.mixtureEpochsFromMasses(masses).orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(("A", 100L, 10L, 125000L, 3750000L),
      ("B", 400L, 20L, 250000L, 1875000L), ("C", 2500L, 50L, 625000L, 750000L)))
  }

  test("mixtureEpochs: isqrt neighbor correction and degenerate strata") {
    import spark.implicits._
    // 2⁵⁰−1: floor(double sqrt) overshoots the integer sqrt by one —
    // the neighbor check must correct it (isqrt = 2²⁵−1, not 2²⁵)
    val big = (1L << 50) - 1
    val masses = Seq(("A", big), ("B", 0L)).toDF("stratum", "n")
    val got = Sampling.mixtureEpochsFromMasses(masses).orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("A", (1L << 25) - 1, 1000000L), ("B", 0L, 0L)))
    // isqrt property sweep around perfect squares
    val edge = (1L to 60L).flatMap(i => Seq(i * i - 1, i * i, i * i + 1))
      .map(n => (s"s$n", n)).toDF("stratum", "n")
    val sq = Sampling.mixtureEpochsFromMasses(edge).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    sq.foreach { case (n, s) =>
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s") }
  }

  test("bootstrapReplicates matches a sequential Poisson-weight reference") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val thresholds = Seq(98751885L, 197503771L, 246879713L, 263338361L,
      267453023L, 268275955L)
    def weight(r: Int, id: Long): Long = {
      val u = java.lang.Long.parseLong(md5hex(s"boot:$r:$id").take(7), 16)
      thresholds.count(u >= _).toLong
    }
    val docs = (0L until 200L).map(i => (i, 1 + (i % 11))).toDF("id", "t")
    val got = Sampling.bootstrapReplicates(docs, col("id"), col("t"), k = 8)
      .orderBy("replicate").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val xs = (0 until 8).map { r =>
      val ws = (0L until 200L).map(i => (weight(r, i), (1 + (i % 11)).toLong))
      (ws.map(_._1).sum, ws.map(w => w._1 * w._2).sum)
    }
    val ssd = 8 * xs.map(x => x._1 * x._1).sum - math.pow(xs.map(_._1).sum.toDouble, 2).toLong
    val sst = 8 * xs.map(x => x._2 * x._2).sum - math.pow(xs.map(_._2).sum.toDouble, 2).toLong
    assert(got.toSeq === (0 until 8).map(r => (r, xs(r)._1, xs(r)._2, ssd, sst)))
    // replicate means hover around the true totals (Poisson(1) mean 1)
    val meanDocs = xs.map(_._1).sum / 8.0
    assert(math.abs(meanDocs - 200.0) < 40, s"mean docs_eff $meanDocs")
    // determinism under repartitioning
    val again = Sampling.bootstrapReplicates(docs.repartition(7), col("id"), col("t"), 8)
      .orderBy("replicate").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq === got.toSeq)
  }

  test("mixtureEpochs wave-merge == one-shot (the p145 maintenance invariant)") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"l${i % 4}", 1 + (i % 9)))
      .toDF("id", "lang", "t")
    val oneShot = Sampling.mixtureEpochs(docs, col("lang"), col("t"))
      .orderBy("stratum").collect().map(_.toSeq).toSeq
    val merged = (0 to 2).map(w =>
        docs.filter(col("id") % 3 === w)
          .groupBy(col("lang").as("stratum")).agg(sum("t").cast("long").as("n")))
      .reduce(_ unionByName _)
      .groupBy("stratum").agg(sum("n").cast("long").as("n"))
    val maintained = Sampling.mixtureEpochsFromMasses(merged)
      .orderBy("stratum").collect().map(_.toSeq).toSeq
    assert(maintained === oneShot)
  }

  test("weightedSample wave-merge == one-shot (the p117 maintenance invariant)") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, s"doc $i " + ("w " * (1 + (i % 37)).toInt)))
      .toDF("doc_id", "text")
    val weight = size(split(trim(col("text")), "\\s+"))
    val oneShot = Sampling.weightedSample(docs, col("doc_id"), weight, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // three arrival waves; store = top-20 of (store ∪ wave top-20)
    val waves = (0 to 2).map(w =>
      Sampling.weightedSample(docs.filter(col("doc_id") % 3 === w),
        col("doc_id"), weight, k = 20))
    val maintained = waves.reduce(_ unionByName _)
      .orderBy(col("es_key").desc, col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(maintained == oneShot)
  }

  test("epochMaterialization: copies = floor(epochs) + hash-drawn fraction; audit is exact") {
    import spark.implicits._
    // two strata: "big" 3600 tokens (60 docs × 60), "small" 400 (40 × 10).
    // sqrt weights: s=60/20 → alpha-0.5 plan upsamples the small stratum;
    // whatever the plan says, the materialized mean must track it within
    // the hash-draw tolerance and integer floors must hold per doc
    val docs = ((0L until 60L).map(i => (i, "big", ("w " * 60).trim)) ++
      (100L until 140L).map(i => (i, "small", ("w " * 10).trim)))
      .toDF("doc_id", "lang", "text")
    val toks = size(split(trim(col("text")), "\\s+"))
    val plan = Sampling.mixtureEpochs(docs, col("lang"), toks)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val rows = Sampling.epochMaterialization(docs, col("doc_id"), col("lang"), toks)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for ((stratum, (n, planned, copies, realized, err)) <- rows) {
      assert(planned == plan(stratum))
      // every doc gets at least floor(planned) and at most floor+1 copies
      assert(copies >= (planned / 1000000) * n && copies <= (planned / 1000000 + 1) * n)
      assert(realized == copies * 1000000 / n)
      assert(err == math.abs(realized - planned))
      // the hash draw tracks the fraction: err within 25% of a copy
      assert(err <= 250000L, s"$stratum err=$err")
    }
  }

  test("rendezvousAudit: minimal disruption — every move lands on the new shard") {
    import spark.implicits._
    val docs = (0L until 900L).map(i => (i, "w " * (1 + (i % 11)).toInt))
      .toDF("doc_id", "text")
    val rows = Sampling.rendezvousAudit(docs, col("doc_id"),
        size(split(trim(col("text")), "\\s+")), shards = 8)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted == (0 until 8), "all shards populated")
    val total = rows.map(_.getLong(1)).sum
    assert(total == 900L)
    // moved mass ≈ 1/9 of the corpus (binomial(900, 1/9): generous 3x bounds)
    val moved = rows.map(_.getLong(3)).sum
    assert(moved > 900 / 27 && moved < 900 / 3, s"moved=$moved")
    // the rendezvous invariant: a move can only be INTO the new shard (8)
    rows.foreach { r =>
      if (!r.isNullAt(5)) assert(r.getInt(5) == 8, r.toString)
      if (r.getLong(3) == 0L) assert(r.isNullAt(5))
    }
  }

  test("rendezvousAudit matches a scalar reimplementation of the argmax") {
    import spark.implicits._
    import java.security.MessageDigest
    def h(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16)
    }
    def shardOf(id: Long, n: Int): Int =
      (0 until n).maxBy(s => (h(s"rv:$s:$id"), -s))
    val docs = (0L until 64L).map(i => (i, "x")).toDF("doc_id", "text")
    // reproduce the per-shard counts from the scalar rule
    val expect = (0L until 64L).groupBy(shardOf(_, 8)).view
      .mapValues(_.size.toLong).toMap
    val got = Sampling.rendezvousAudit(docs, col("doc_id"), lit(1), shards = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // and the moved set is exactly {id : shardOf(id,9) != shardOf(id,8)}
    val movedExpect = (0L until 64L)
      .filter(i => shardOf(i, 9) != shardOf(i, 8))
      .groupBy(shardOf(_, 8)).view.mapValues(_.size.toLong).toMap
    val movedGot = Sampling.rendezvousAudit(docs, col("doc_id"), lit(1), shards = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).filter(_._2 > 0).toMap
    assert(movedGot == movedExpect)
  }
}
