package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine of a vector with itself is 1") {
    val self = emb.filter(col("vec_id") === 0)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("cosineTopK ranks the query vector itself first") {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val top = Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), q, k = 5)
      .collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getDouble(1) == 1.0)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("lshTopK achieves high recall vs brute force") {
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, col("vec_id"), col("embedding"), q,
        k = 10, dim = q.length, planesPerTable = 4, tables = 16)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low; exact=$exact approx=$approx")
  }

  test("nearestNeighbor is symmetric-consistent on a tiny set") {
    val nn = Similarity.nearestNeighbor(emb.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding")).collect()
    assert(nn.length == 10)
    nn.foreach { r => assert(r.getLong(0) != r.getLong(1)) }
  }

  test("ivfTopK achieves reasonable recall and full recall at nprobe=K") {
    val cents = Similarity.labelCentroids(emb, col("label"), col("embedding"))
      .collect().groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val probed = Similarity.ivfTopK(emb, col("vec_id"), col("embedding"), cents, q,
        k = 10, nprobe = 4).collect().map(_.getLong(0)).toSet
    val all = Similarity.ivfTopK(emb, col("vec_id"), col("embedding"), cents, q,
        k = 10, nprobe = cents.length).collect().map(_.getLong(0)).toSet
    assert(all == exact) // probing every bucket must equal brute force
    val recall = (exact intersect probed).size.toDouble / exact.size
    assert(recall >= 0.3, s"ivf recall $recall; exact=$exact probed=$probed")
  }

  test("deterministic hyperplanes: same seed → same planes") {
    assert(Similarity.hyperplanes(4, 8, 7L) == Similarity.hyperplanes(4, 8, 7L))
    assert(Similarity.hyperplanes(4, 8, 7L) != Similarity.hyperplanes(4, 8, 8L))
  }

  test("hardNegatives: never same-label, never self, equals the brute-force ranking") {
    import spark.implicits._
    val rng = new scala.util.Random(85L)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rng.nextGaussian().toFloat), (i % 3).toInt))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, col("vec_id"), col("embedding"),
        col("label"), col("vec_id") < 5, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val labels = vecs.map(v => v._1 -> v._3).toMap
    got.foreach { case (a, b, _) =>
      assert(a != b && labels(a) != labels(b), s"($a,$b)")
    }
    // brute force in driver code
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val nx = math.sqrt(x.map(p => p.toDouble * p.toDouble).sum)
      val ny = math.sqrt(y.map(p => p.toDouble * p.toDouble).sum)
      BigDecimal(d / (nx * ny)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (0L until 5L).flatMap { a =>
      vecs.filter(v => v._1 != a && v._3 != labels(a))
        .map(v => (a, v._1, cos(vecs(a.toInt)._2, v._2)))
        .sortBy { case (_, b, c) => (-c, b) }
        .take(4)
    }
    assert(got.toSeq == expected)
    assert(got.count(_._1 == 0L) == 4)
  }

  test("lshConfigFor: occupancy stays bounded as n grows, recall target is met") {
    // per-plane collision at cos 0.9 (the production near-dup threshold)
    val p = Similarity.planeCollisionProb(0.9)
    assert(math.abs(p - (1.0 - math.acos(0.9) / math.Pi)) < 1e-12)
    for (n <- Seq(1000L, 100000L, 10000000L)) {
      val (planes, tables) = Similarity.lshConfigFor(n, minCos = 0.9)
      // the scale invariant the sf1.0 rehearsal was about: expected
      // bucket occupancy — candidate comparisons per vector per table —
      // must not grow with corpus size
      assert(n.toDouble / math.pow(2.0, planes.toDouble) <= 256.0 + 1e-9,
        s"n=$n planes=$planes")
      // the recall the (planes, tables) pair promises
      val recall = 1.0 - math.pow(1.0 - math.pow(p, planes.toDouble), tables.toDouble)
      assert(recall >= 0.9, s"n=$n planes=$planes tables=$tables recall=$recall")
      assert(tables <= 64)
    }
    // planes grow logarithmically: 1000× the corpus adds ~10 planes
    val (p1, _) = Similarity.lshConfigFor(100000L, 0.9)
    val (p2, _) = Similarity.lshConfigFor(100000000L, 0.9)
    assert(p2 - p1 == 10, s"$p1 -> $p2")
    // when the table cap binds (1e9 vectors needs ~70 tables for 0.9
    // recall at the occupancy target), planes back off — occupancy
    // grows past the target but recall is still met; raising the cap
    // restores the occupancy bound
    val (pc, tc) = Similarity.lshConfigFor(1000000000L, 0.9)
    val pHi = Similarity.planeCollisionProb(0.9)
    assert(tc <= 64 && 1.0e9 / math.pow(2.0, pc.toDouble) > 256.0,
      s"planes=$pc tables=$tc")
    assert(1.0 - math.pow(1.0 - math.pow(pHi, pc.toDouble), tc.toDouble) >= 0.9)
    val (pw, tw) = Similarity.lshConfigFor(1000000000L, 0.9, maxTables = 128)
    assert(1.0e9 / math.pow(2.0, pw.toDouble) <= 256.0 + 1e-9 && tw <= 128,
      s"planes=$pw tables=$tw")
    // low-threshold regime: the table cap binds and planes back off —
    // the config degrades toward fewer/larger buckets instead of
    // silently missing recall (callers should route to IVF here)
    val (pl, tl) = Similarity.lshConfigFor(10000000L, minCos = 0.4)
    assert(tl <= 64)
    val pLow = Similarity.planeCollisionProb(0.4)
    val recallLow =
      1.0 - math.pow(1.0 - math.pow(pLow, pl.toDouble), tl.toDouble)
    assert(recallLow >= 0.9, s"planes=$pl tables=$tl recall=$recallLow")
  }

  test("contrastiveTriplets: hand-built corpus — exact positive and hardest negative") {
    import spark.implicits._
    // labels: A = {1, 2, 3}, B = {4}. Vectors on a plane so cosines are
    // hand-computable: 1≈2 (near-dup pair), 3 orthogonal-ish, 4 (label
    // B) close to 1 — the hard negative for anchors 1 and 2.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), "A"),
      (2L, Seq(0.99f, 0.14f), "A"),
      (3L, Seq(0.0f, 1.0f), "A"),
      (4L, Seq(0.95f, 0.31f), "B")
    ).toDF("vec_id", "embedding", "label")
    val pairs = Seq((1L, 2L, 0.99)).toDF("id_a", "id_b", "cos")
    val got = Similarity.contrastiveTriplets(emb, col("vec_id"),
        col("embedding"), col("label"), pairs)
      .orderBy("anchor").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // anchors are exactly the pair's two sides; both pick each other as
    // positive and vector 4 (the only different-label one) as negative
    assert(got == Seq((1L, 2L, 4L), (2L, 1L, 4L)))
    // a corpus with one label yields no trainable triplet
    val oneLabel = emb.withColumn("label", lit("A"))
    assert(Similarity.contrastiveTriplets(oneLabel, col("vec_id"),
      col("embedding"), col("label"), pairs).count() == 0)
  }

  test("knnEval: separable clusters classify cleanly; a planted confusable misclassifies") {
    import spark.implicits._
    // two tight clusters on orthogonal axes; eval ids 100 (cluster 0)
    // and 101 (cluster 1), plus eval 102 whose vector sits in cluster
    // 1's direction but carries true label 0 — must be confused
    val train = (0 until 6).map(i => (i.toLong, Seq(1.0f, 0.01f * i), 0)) ++
      (6 until 12).map(i => (i.toLong, Seq(0.01f * i, 1.0f), 1))
    val evals = Seq(
      (100L, Seq(1.0f, 0.02f), 0), (101L, Seq(0.03f, 1.0f), 1),
      (102L, Seq(0.05f, 1.0f), 0))
    val df = (train ++ evals).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnEval(df, col("vec_id"), col("embedding"),
        col("label"), evalPred = col("vec_id") >= 100, k = 3)
      .orderBy("true_label", "pred_label").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((0, 0, 1L), (0, 1, 1L), (1, 1, 1L)))
  }

  test("rrfFuse: hand-computed two-leg fusion with partial overlap") {
    import spark.implicits._
    // leg A ranks: 10 (1), 20 (2), 30 (3); leg B ranks: 20 (1), 40 (2)
    val a = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("id", "score")
    val b = Seq((20L, 5.0), (40L, 4.0)).toDF("id", "score")
    val got = Similarity.rrfFuse(Seq("a" -> a, "b" -> b), rrfK = 60, topK = 10)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3))).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    // 20 is in both legs and must fuse highest; 40 (rank 2 in B, 1/62)
    // beats 30 (rank 3 in A, 1/63)
    assert(got.map(_._1) == Seq(20L, 10L, 40L, 30L))
    assert(got.head === ((20L, Some(2L), Some(1L), r6(1.0 / 62 + 1.0 / 61))))
    // single-leg ids carry a null rank for the absent leg
    assert(got(1) === ((10L, Some(1L), None, r6(1.0 / 61))))
    assert(got(2) === ((40L, None, Some(2L), r6(1.0 / 62))))
    assert(got(3) === ((30L, Some(3L), None, r6(1.0 / 63))))
  }

  test("rrfFuse: leg score ties break by id, topK bounds the output") {
    import spark.implicits._
    val a = Seq((3L, 1.0), (1L, 1.0), (2L, 1.0)).toDF("id", "score")
    val got = Similarity.rrfFuse(Seq("only" -> a), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // equal scores rank by ascending id; topK=2 keeps the best two
    assert(got == Seq((1L, 1L), (2L, 2L)))
  }

  test("rankingMetrics: perfect probes score 1.0; a pruned probe shows in nDCG/recall") {
    import spark.implicits._
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    // train: t1,t2 land in bucket 0, t3,t4 in bucket 1; eval q=(1,0.3)
    // probes order buckets (0, then 1); exact top-3 vs q = t1, t2, t3
    val df = Seq(
      (1L, Seq(1.0, 0.02)), (2L, Seq(0.8, 0.6)),
      (3L, Seq(0.6, 0.8)), (4L, Seq(0.1, 1.0)),
      (10L, Seq(1.0, 0.3))).toDF("vec_id", "embedding")
    val w = Similarity.dcgWeightsMicro(3)
    def run(nprobe: Int) =
      Similarity.rankingMetrics(df, col("vec_id"), col("embedding"), cents,
        col("vec_id") === 10, k = 3, nprobe = nprobe)
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).head
    // nprobe=2 covers every bucket: system == exact ⇒ all metrics perfect
    assert(run(2) == ((3L, 1, 1000000L, w.sum, 1000000L)))
    // nprobe=1 sees only bucket 0 (t1, t2): exact hit t3 is unreachable
    val (nHits, firstRank, rr, dcg, ndcg) = run(1)
    assert(nHits == 2L && firstRank == 1 && rr == 1000000L)
    assert(dcg == w(0) + w(1))
    assert(ndcg == (w(0) + w(1)) * 1000000L / w.sum)
  }

  test("rankingMetrics: an eval query with zero hits reports zeros, not nulls") {
    import spark.implicits._
    // one train vector per bucket; eval q probes ONLY bucket 0, but the
    // exact top-1 (k=1) is the bucket-1 vector ⇒ sys∩rel = ∅
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.6, 0.8)),
      (10L, Seq(0.9, 0.5))).toDF("vec_id", "embedding")
    // t2 assigns to bucket 1 (cos 0.8 > 0.6); q=(0.9,0.5) probes only
    // bucket 0 (cos 0.874 > 0.486) ⇒ sys={t1}; but exact top-1 is t2
    // (cos(q,t2)=0.94/1.0296=0.913 > cos(q,t1)=0.874) ⇒ zero hits
    val r = Similarity.rankingMetrics(df, col("vec_id"), col("embedding"), cents,
        col("vec_id") === 10, k = 1, nprobe = 1)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).head
    assert(r == ((0L, 0, 0L, 0L, 0L)))
  }

  test("evalProximity: max-cos scoring, shortlist ranks, contamination flag, tie-breaks") {
    import spark.implicits._
    // probes 100/101 are identical ⇒ best_probe tie breaks to 100
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.8, 0.6)), (3L, Seq(0.0, 1.0)),
      (100L, Seq(1.0, 0.0)), (101L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val rows = Similarity.evalProximity(df, col("vec_id"), col("embedding"),
        col("vec_id") >= 100, topM = 2, contamCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getInt(4))).toSeq
    assert(rows == Seq(
      (1L, 100L, 1.0, 1, 1),   // exact duplicate of a probe: contaminated
      (2L, 100L, 0.8, 2, 0),   // shortlisted but clean
      (3L, 100L, 0.0, 0, 0)))  // orthogonal: unselected, clean
  }

  test("labelNoiseAudit flags the planted mislabel and passes the clean anchor") {
    import spark.implicits._
    val df = (Seq(
      (0L, Seq(1.0, 0.00), 0), (2L, Seq(1.0, 0.02), 0), (4L, Seq(1.0, 0.04), 0),
      (6L, Seq(1.0, 0.06), 0), (8L, Seq(1.0, 0.08), 0),
      (11L, Seq(0.0, 1.0), 1), (13L, Seq(0.02, 1.0), 1), (15L, Seq(0.04, 1.0), 1),
      (50L, Seq(1.0, 0.01), 1))) // planted: sits in cluster 0, labeled 1
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.labelNoiseAudit(df, col("vec_id"), col("embedding"),
        col("label"), col("vec_id") === 0 || col("vec_id") === 50, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getInt(5))).toSeq
    assert(rows == Seq(
      // clean anchor: the planted vector IS its nearest neighbor, so the
      // vote is 2 own / 1 foreign — still a clear pass
      (0L, 0, 0, 2L, 2L, 0),
      (50L, 1, 0, 3L, 0L, 1)))  // planted: own label gets zero votes
  }

  test("mutualKnnGraph drops unreciprocated hub→satellite edges, keeps mutual ones") {
    import spark.implicits._
    // hub 1 has five satellites at equal cos; with k=2 the hub only
    // reciprocates 2 and 3 (cos ties break to the smaller id), so
    // (1,4)(1,5)(1,6) must drop; isolated pair (7,8) is trivially mutual
    val pairs = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.9), (1L, 4L, 0.9), (1L, 5L, 0.9), (1L, 6L, 0.9),
      (7L, 8L, 0.8)).toDF("id_a", "id_b", "cos")
    val got = Similarity.mutualKnnGraph(pairs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.9), (1L, 3L, 0.9), (7L, 8L, 0.8)))
  }

  test("knnStoreMerge wave-merge == one-shot (the p155 maintenance invariant)") {
    import spark.implicits._
    // a dense-ish deterministic pair soup: cos varies by (a+b) so top-k
    // selection is non-trivial; three waves split by (a+b) % 3
    val pairs = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L
      if (a * 7 + b * 3) % 4 != 0
    } yield (a, b, ((a + b) % 9 + 1) / 10.0)).toDF("id_a", "id_b", "cos")
    val oneShot = Similarity.mutualKnnGraph(pairs, k = 3)
      .collect().map(_.toSeq).toSeq
    val store = (0 to 2).foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, w) => Some(Similarity.knnStoreMerge(st,
        pairs.filter((col("id_a") + col("id_b")) % 3 === w), k = 3))
    }.get
    val maintained = Similarity.mutualKnnFromStore(store)
      .collect().map(_.toSeq).toSeq
    assert(maintained == oneShot && oneShot.nonEmpty)
  }

  test("rrfFuse validates its inputs") {
    import spark.implicits._
    val ok = Seq((1L, 1.0)).toDF("id", "score")
    intercept[IllegalArgumentException] { Similarity.rrfFuse(Seq.empty) }
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq("x" -> ok, "x" -> ok))
    }
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq("bad" -> ok.withColumn("extra", lit(1))))
    }
  }
}
