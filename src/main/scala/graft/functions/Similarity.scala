package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity / approximate-nearest-neighbor operators over an
  * embedding column (`array<float>`).
  *
  * All arithmetic runs through the native
  * [[graft.functions.expressions.ArrayDot]] expression in DOUBLE
  * precision with deterministic left-to-right accumulation — results are
  * reproducible across engines and bit-identical to the
  * `zip_with`+`aggregate` formulation, but stay inside whole-stage
  * codegen (higher-order functions are CodegenFallback and dominate
  * similarity scans when evaluated interpreted).
  *
  * Scale path: brute-force top-k is a broadcast of the query vector and a
  * single narrow pass + `orderBy ... limit k` (Spark plans it as TakeOrdered
  * — no full sort). The LSH variant buckets vectors by random-hyperplane
  * signs so candidate generation shuffles only `(bucket, id)` keys.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorOps.dotCol(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector (given as a
    * literal sequence — broadcast by construction). The query's norm is
    * folded driver-side so the per-row expression is one dot product and
    * one row-norm, not three array folds.
    */
  def cosineTopK(df: DataFrame, id: Column, vec: Column,
                 query: Seq[Double], k: Int, roundTo: Int = 6): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val q = array(query.map(lit): _*)
    df.select(id.as("id"),
        round(dot(vec, q) / (norm(vec) * lit(qNorm)), roundTo).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** All-pairs top-1 neighbor for a (small/filtered) vector set: broadcast
    * one side, rank per id. For the full-corpus case use [[lshBuckets]]
    * first and run this within buckets.
    */
  def nearestNeighbor(df: DataFrame, id: Column, vec: Column, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = df.select(id.as("id_a"), vec.as("va"))
    val b = df.select(id.as("id_b"), vec.as("vb"))
    val pairs = a.join(broadcast(b), col("id_a") =!= col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), roundTo))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id_a"), col("id_b").as("nn"), col("cos"))
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * anchor vector, the k most-similar vectors with a DIFFERENT label
    * (near-misses make the strongest negatives; random negatives are
    * trivially separable). Ranking runs through [[graft.plans.TopKPerGroup]]
    * — bounded per-partition heaps, ≤ k rows per anchor cross the
    * shuffle — not a full window sort. Anchors broadcast (a mining batch
    * is small by construction); at full-corpus scale run this inside
    * LSH/IVF blocks exactly like [[nearestNeighbor]].
    *
    * Ties at the rounded-cosine resolution break by smaller `id_b`, so
    * the result is a pure function of the input (engine-portable).
    */
  def hardNegatives(df: DataFrame, id: Column, vec: Column, label: Column,
                    anchorPred: Column, k: Int, roundTo: Int = 6): DataFrame = {
    val anchors = df.filter(anchorPred)
      .select(id.as("id_a"), vec.as("va"), label.as("lbl_a"))
    val cands = df.select(id.as("id_b"), vec.as("vb"), label.as("lbl_b"))
    val pairs = broadcast(anchors)
      .join(cands, col("id_a") =!= col("id_b") && col("lbl_a") =!= col("lbl_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va").cast("array<double>"),
          col("vb").cast("array<double>")), roundTo).as("cos"))
    graft.plans.TopKPerGroup.topK(pairs, Seq(col("id_a")),
        struct(col("cos"), -col("id_b")), k)
      .orderBy(col("id_a"), col("cos").desc, col("id_b"))
  }

  /** Contrastive-training TRIPLET export — the (anchor, positive,
    * negative) table a contrastive / metric-learning trainer consumes,
    * composed from the two halves already in the engine: positives are
    * near-dup pairs (pass the LSH-blocked pair set at scale — never
    * all-pairs), negatives are the hardest different-label candidate
    * per anchor (the [[hardNegatives]] shape, restricted to the anchors
    * that HAVE a positive — a set bounded by the corpus's near-dup
    * mass, hence broadcastable). Top-1 selections run through the
    * TopKPerGroup physical operator (bounded heaps, one row per anchor
    * crosses the shuffle). Anchors whose candidates all share their
    * label drop out (inner join) — a corpus with one label has no
    * trainable triplet. Ties break by id at the rounded resolution, so
    * the export is engine-portable and retry-stable.
    */
  def contrastiveTriplets(df: DataFrame, id: Column, vec: Column, label: Column,
                          pairs: DataFrame, roundTo: Int = 6,
                          anchorPred: Column = lit(true)): DataFrame = {
    // anchorPred bounds the EXPORT, not the mining quality: on a corpus
    // where most vectors have a positive, "anchors with a positive" is
    // the whole corpus and exact negative mining degenerates to
    // all-pairs (measured: 194 s at sf1.0 unbounded vs ~2 s with a
    // fixed anchor sample). A triplet export is batch-sized by the
    // trainer anyway — repeated exports over disjoint key ranges cover
    // the corpus, each one linear (the g56 fixed-sample posture).
    val sym = pairs.select(col("id_a").as("anchor"), col("id_b").as("pos_id"), col("cos"))
      .unionByName(pairs.select(col("id_b").as("anchor"), col("id_a").as("pos_id"), col("cos")))
      .filter(anchorPred)
    val pos = graft.plans.TopKPerGroup.topK(sym, Seq(col("anchor")),
        struct(col("cos"), -col("pos_id")), 1)
      .select(col("anchor"), col("pos_id"), col("cos").as("pos_cos"))
    val anchors = broadcast(pos.select(col("anchor")).distinct()
      .join(df.select(id.as("anchor"), vec.as("va"), label.as("lbl_a")), "anchor"))
    val cands = df.select(id.as("id_b"), vec.as("vb"), label.as("lbl_b"))
    val negPairs = anchors.join(cands,
        col("anchor") =!= col("id_b") && col("lbl_a") =!= col("lbl_b"))
      .select(col("anchor"), col("id_b"),
        round(cosine(col("va").cast("array<double>"),
          col("vb").cast("array<double>")), roundTo).as("neg_cos"))
    val neg = graft.plans.TopKPerGroup.topK(negPairs, Seq(col("anchor")),
        struct(col("neg_cos"), -col("id_b")), 1)
      .select(col("anchor"), col("id_b").as("neg_id"), col("neg_cos"))
    pos.join(neg, "anchor")
      .select(col("anchor"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"))
  }

  /** In-engine kNN evaluation — the "does this embedding space separate
    * my labels" loop a training pipeline runs after every embedding
    * refresh, next to the centroid classifier ([[nearestCentroid]], p20)
    * and the recall audits (p91/p94): classify each EVAL vector by the
    * majority label of its k nearest TRAIN vectors and report the
    * confusion matrix. Majority ties break toward the smaller label,
    * cosine ties toward the smaller train id — the whole eval is a pure
    * function of the corpus, so accuracy numbers reproduce bit-for-bit
    * across engines and retries (an eval that drifts with partitioning
    * cannot gate a release).
    *
    * Scale shape: the eval set is BOUNDED BY DESIGN (an eval set is a
    * fixed artifact, not a corpus-proportional one — the p121/g56
    * fixed-sample posture), so the broadcast eval × train cosine pass
    * is linear in train size; per-eval top-k runs through the
    * bounded-heap operator (k rows per eval id cross the shuffle). At
    * 100 TB the train side streams through one codegen stage — and the
    * same op drops into IVF blocks when even that is too wide.
    */
  def knnEval(df: DataFrame, id: Column, vec: Column, label: Column,
              evalPred: Column, k: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"knnEval needs k >= 1: $k")
    val evals = df.filter(evalPred)
      .select(id.as("eval_id"), vec.as("ve"), label.as("true_label"))
    val train = df.filter(!evalPred)
      .select(id.as("train_id"), vec.as("vt"), label.as("train_label"))
    val scored = broadcast(evals).join(train, expr("true"))
      .select(col("eval_id"), col("true_label"), col("train_id"), col("train_label"),
        round(cosine(col("ve").cast("array<double>"),
          col("vt").cast("array<double>")), roundTo).as("cos"))
    val topk = graft.plans.TopKPerGroup.topK(scored, Seq(col("eval_id")),
      struct(col("cos"), -col("train_id")), k)
    val votes = topk.groupBy("eval_id", "true_label", "train_label")
      .agg(count(lit(1)).as("n_votes"))
    val pred = graft.plans.TopKPerGroup.topK(votes, Seq(col("eval_id")),
        struct(col("n_votes"), negate(col("train_label").cast("int"))), 1)
      .select(col("eval_id"), col("true_label"), col("train_label").as("pred_label"))
    pred.groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
  }

  /** MUTUAL-kNN graph sparsification — the similarity-graph builder
    * that sits between near-dup pair generation and clustering: from a
    * candidate pair set (the LSH-blocked near-dup pairs at scale —
    * never all-pairs), keep edge (a, b) only when b is in a's top-k
    * neighbors AND a is in b's. Thresholded graphs (p24/p32 collapse at
    * `cos ≥ τ`) explode around hubs — one generic vector inside a dense
    * region keeps its entire neighborhood; the mutuality test is the
    * standard degree-bounded sparsifier (≤ k per node by construction,
    * and asymmetric hub→satellite edges drop because the hub doesn't
    * reciprocate). The result is the graph SemDedup-style semantic
    * clustering and kNN-graph community detection actually run on.
    *
    * Shape: symmetrize the pair set, per-node top-k through the
    * bounded-heap operator (≤ k rows per node cross the shuffle), then
    * ONE self-semi-join on the reversed edge for mutuality — cost is
    * O(k·|nodes|) after blocking, independent of how dense the raw
    * pair set was. Ties break toward the smaller neighbor id.
    */
  def mutualKnnGraph(pairs: DataFrame, k: Int): DataFrame =
    mutualKnnFromStore(knnStoreMerge(None, pairs, k))

  /** The MAINTAINED form's merge step: fold a new wave of candidate
    * pairs into the per-node top-k neighbor STORE. Top-k selection is
    * mergeable — `topk(A ∪ B) = topk(topk(A) ∪ B)` for a fixed total
    * order — so a store maintained wave by wave equals the one-shot
    * top-k over everything (the p58/p117/p128 maintenance discipline);
    * state is ≤ k rows per node, fixed-size forever.
    */
  def knnStoreMerge(store: Option[DataFrame], wavePairs: DataFrame,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val sym = wavePairs
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("cos"))
      .unionByName(wavePairs.select(col("id_b").as("src"),
        col("id_a").as("dst"), col("cos")))
    val in = store.fold(sym)(_.unionByName(sym))
    graft.plans.TopKPerGroup.topK(in, Seq(col("src")),
      struct(col("cos"), -col("dst")), k)
  }

  /** Mutuality readout over a per-node top-k neighbor store: keep
    * (a, b) only when each lists the other; canonical `id_a < id_b`.
    */
  def mutualKnnFromStore(top: DataFrame): DataFrame = {
    val rev = top.select(col("dst").as("src"), col("src").as("dst"))
    top.join(rev, Seq("src", "dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"), col("cos"))
      .orderBy("id_a", "id_b")
  }

  /** LABEL-NOISE audit — confident-learning-style kNN disagreement,
    * the quality gate for LABELED training data (classification heads,
    * reward-model preference sets, quality-classifier seeds): for each
    * anchor in a bounded audit sample, take the k nearest OTHER vectors
    * by cosine, vote, and flag anchors whose own label loses the vote.
    * Unlike [[knnEval]] (which scores a SPLIT's accuracy), this
    * interrogates individual rows: a flagged anchor sitting deep inside
    * another label's neighborhood is, with high probability, mislabeled
    * — the rows a re-annotation pass should look at first.
    *
    * Per anchor it emits both vote masses (`n_votes_pred`,
    * `n_votes_own`), so downstream can threshold on MARGIN (pred−own)
    * rather than the binary flag. Majority ties break toward the
    * smaller label, cosine ties toward the smaller id — pure function
    * of the corpus.
    *
    * Scale shape: anchors are a fixed bounded sample (an audit is an
    * artifact — the g56 posture; sweep the corpus in key-range batches),
    * broadcast over ONE codegen scan of the full vector set; per-anchor
    * top-k through the bounded-heap operator.
    */
  def labelNoiseAudit(df: DataFrame, id: Column, vec: Column, label: Column,
                      anchorPred: Column, k: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"labelNoiseAudit needs k >= 1: $k")
    val anchors = df.filter(anchorPred)
      .select(id.as("anchor_id"), vec.cast("array<double>").as("va"),
        label.cast("int").as("own_label"))
    val cands = df.select(id.as("cand_id"), vec.cast("array<double>").as("vc"),
      label.cast("int").as("cand_label"))
    val scored = broadcast(anchors)
      .join(cands, col("anchor_id") =!= col("cand_id"))
      .select(col("anchor_id"), col("own_label"), col("cand_id"), col("cand_label"),
        round(cosine(col("va"), col("vc")), roundTo).as("cos"))
    val topk = graft.plans.TopKPerGroup.topK(scored, Seq(col("anchor_id")),
      struct(col("cos"), -col("cand_id")), k)
    val votes = topk.groupBy("anchor_id", "own_label", "cand_label")
      .agg(count(lit(1)).as("n_votes"))
    val pred = graft.plans.TopKPerGroup.topK(votes, Seq(col("anchor_id")),
        struct(col("n_votes"), negate(col("cand_label"))), 1)
      .select(col("anchor_id"), col("own_label"),
        col("cand_label").as("pred_label"), col("n_votes").as("n_votes_pred"))
    val own = votes.filter(col("cand_label") === col("own_label"))
      .select(col("anchor_id"), col("n_votes").as("n_votes_own"))
    pred.join(own, Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("own_label"), col("pred_label"),
        col("n_votes_pred"),
        coalesce(col("n_votes_own"), lit(0L)).as("n_votes_own"),
        when(col("pred_label") =!= col("own_label"), 1).otherwise(0)
          .cast("int").as("mislabel_flag"))
      .orderBy("anchor_id")
  }

  /** Per-label mean embedding ("class centroids") as a long-format
    * DataFrame `(label, pos, c)` — one `posexplode` + hash aggregate,
    * map-side combinable; the natural coarse quantizer for [[ivfTopK]].
    */
  def labelCentroids(df: DataFrame, label: Column, vec: Column, roundTo: Int = 4): DataFrame =
    df.select(label.as("label"), posexplode(vec).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      // + 0.0 normalizes IEEE negative zero: a tiny negative mean rounds
      // to -0.0 on engines that round in double arithmetic and to +0.0
      // on Spark's BigDecimal path — numerically equal, rendered
      // differently (the driver's hash sees the rendering). (-0.0)+0.0
      // is +0.0 by IEEE 754, so both engines land on one representation.
      .agg((round(avg(col("v").cast("double")), roundTo) + 0.0).as("c"))
      .orderBy("label", "pos")

  /** Nearest-centroid classification: label every vector with the argmax
    * of cosine similarity against the (driver-collected, broadcast-by-
    * construction) per-label centroids; ties break toward the smallest
    * label. Map-side only — 10s of native dot products per row inside one
    * codegen stage; the only shuffle is whatever the caller aggregates
    * afterward. This is the "assign to coarse quantizer" step of IVF
    * reused as a classifier.
    */
  def nearestCentroid(df: DataFrame, id: Column, vec: Column, label: Column,
                      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "nearestCentroid needs at least one centroid")
    // argmax over the ROUNDED cosine: raw last-ulp values are not
    // portable across engines, so near-tied centroids could otherwise
    // classify differently than an oracle computing its own cosines
    val scored = centroids.map { case (lab, c) =>
      val cNorm = math.sqrt(c.map(x => x * x).sum)
      struct(round(dot(vec, array(c.map(lit): _*)) / (norm(vec) * lit(cNorm)), 6).as("cos"),
        lit(-lab).as("nl"))
    }
    // Spark's greatest() requires >= 2 arguments; K=1 degenerates
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    df.select(id.as("id"), label.as("label"),
      (best.getField("nl") * -1).as("predicted"))
  }

  /** CALIBRATION bins for the centroid classifier — the reliability-
    * diagram table behind Expected Calibration Error: bucket every
    * vector by the classifier's CONFIDENCE (cosine to the winning
    * centroid, micro-units) and report per-bin count, hits, exact
    * accuracy ppm, and the summed confidence mass. A classifier gating
    * corpus curation (p20/p43-style) is only trustworthy if 0.9-
    * confidence predictions are right ~90% of the time — this is the
    * query that checks, and |acc − conf| per bin weighted by n/N is
    * ECE, computable exactly from these columns.
    *
    * Everything is integer: confidence = `round(cos·1e6)` on the
    * 6-dp-rounded cosine (never a raw double truncation — Spark CAST
    * truncates where other engines round, so the explicit round-then-
    * cast is the portable form), bins by floor division on the
    * non-negative clamp, accuracy in ppm. One broadcast-centroid
    * map pass + a `bins`-row aggregate.
    */
  def calibrationBins(df: DataFrame, id: Column, vec: Column, label: Column,
                      centroids: Seq[(Int, Seq[Double])],
                      bins: Int = 10): DataFrame = {
    require(centroids.nonEmpty, "calibrationBins needs at least one centroid")
    require(bins >= 1, s"bins must be positive: $bins")
    val scored = centroids.map { case (lab, c) =>
      val cNorm = math.sqrt(c.map(x => x * x).sum)
      struct(round(dot(vec, array(c.map(lit): _*)) / (norm(vec) * lit(cNorm)), 6)
        .as("cos"), lit(-lab).as("nl"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    df.select(label.cast("int").as("label"),
        (best.getField("nl") * -1).as("predicted"),
        round(best.getField("cos") * 1000000, 0).cast("long").as("conf_micro"))
      .select(col("label"), col("predicted"), col("conf_micro"),
        least(expr(s"greatest(conf_micro, 0L) * $bins div 1000000"),
          lit((bins - 1).toLong)).cast("int").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("predicted") === col("label"), 1L).otherwise(0L))
          .as("n_correct"),
        sum(col("conf_micro")).as("conf_sum_micro"))
      .withColumn("acc_ppm", expr("n_correct * 1000000 div n"))
      .orderBy("bin")
  }

  /** IVF (inverted-file) ANN: assign every vector to its nearest coarse
    * centroid (bucket); a query probes only the `nprobe` nearest buckets
    * and re-ranks exactly. At scale the bucket assignment partitions the
    * corpus, so a query touches ~nprobe/K of the data.
    */
  def ivfAssign(df: DataFrame, id: Column, vec: Column,
                centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.nonEmpty, "ivfAssign needs at least one centroid")
    // argmax over the ROUNDED cosine (see nearestCentroid) so bucket
    // assignment is reproducible across engines; ties break toward the
    // larger bucket index (greatest over (cos, bucket) structs)
    val scored = centroids.zipWithIndex.map { case (cvec, i) =>
      struct(round(cosine(vec, array(cvec.map(lit): _*)), 6).as("cos"), lit(i).as("bucket"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    df.select(id.as("id"), vec.as("v"), best.getField("bucket").as("bucket"))
  }

  /** The `nprobe` nearest coarse centroids to `query`, ranked on the
    * ROUNDED cosine with an explicit index tie-break (HALF_UP matches
    * SQL round) so an oracle re-deriving the probe set agrees even when
    * two centroids score identically at 6 decimals.
    */
  def ivfProbes(centroids: Seq[Seq[Double]], query: Seq[Double],
                nprobe: Int): Seq[Int] = {
    def cosScalar(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
    centroids.zipWithIndex
      .sortBy { case (c, i) => (-r6(cosScalar(c, query)), i) }
      .take(nprobe).map(_._2)
  }

  /** Exact re-rank of candidate `(id, v)` rows against `query`: rounded
    * cosine, id tie-break, top `k`.
    */
  def rerankTopK(candidates: DataFrame, query: Seq[Double], k: Int): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val q = array(query.map(lit): _*)
    candidates
      .select(col("id"), round(dot(col("v"), q) / (norm(col("v")) * lit(qNorm)), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  def ivfTopK(df: DataFrame, id: Column, vec: Column,
              centroids: Seq[Seq[Double]], query: Seq[Double],
              k: Int, nprobe: Int): DataFrame = {
    val probe = ivfProbes(centroids, query, nprobe)
    val assigned = ivfAssign(df, id, vec, centroids)
      .filter(col("bucket").isin(probe: _*))
    rerankTopK(assigned, query, k)
  }

  /** Per-rank DCG discount weights in exact integer MICRO-units:
    * `round(1e6 / log2(rank+1))` for ranks 1..k, computed once on the
    * driver and inlined as literals on BOTH engines — so DCG sums are
    * order-free integer arithmetic, never a float accumulation whose
    * last ulp depends on add order or libm.
    */
  def dcgWeightsMicro(k: Int): Seq[Long] =
    (1 to k).map(i => Math.round(1e6 / (Math.log(i + 1.0) / Math.log(2.0))))

  /** Retrieval RANKING-quality metrics — the eval gate that complements
    * the hit-counting audits (p91/p94 recall, p125 kNN confusion) with
    * ORDER sensitivity: for a bounded multi-query eval set, run the IVF
    * probe path (nprobe of the coarse buckets) and the exact brute-force
    * ranking side by side, treat the exact top-k as the relevant set,
    * and score the approximate list per query with recall@k, MRR and
    * binary-relevance nDCG@k — the triple every retrieval deployment
    * reports. An ANN config can have perfect recall and still bury the
    * best hits at the bottom of the list; nDCG/MRR see that, recall
    * cannot.
    *
    * Every metric is an exact integer in micro-units ([[dcgWeightsMicro]]
    * — literal per-rank discounts shared with the SQL oracle; reciprocal
    * ranks as `1e6 div rank`), so the eval is a pure function of the
    * corpus: no float accumulation, engine- and retry-portable, fit to
    * gate a release.
    *
    * Scale shape: the eval set is bounded by design (fixed key range —
    * an eval set is an artifact, not corpus-proportional; the p121/g56
    * posture), so both passes are one broadcast-eval × train codegen
    * scan; per-query top-k runs through the bounded-heap TopKPerGroup
    * operator (≤ k rows per query cross the shuffle). At 100 TB the
    * exact leg is the expensive-but-linear audit you run on a schedule,
    * the IVF leg is the production path being audited.
    */
  def rankingMetrics(df: DataFrame, id: Column, vec: Column,
                     centroids: Seq[Seq[Double]], evalPred: Column,
                     k: Int, nprobe: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"k and nprobe must be positive: $k, $nprobe")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = df.filter(evalPred)
      .select(id.as("eval_id"), vec.cast("array<double>").as("qe"))
    val centDf = centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("bucket", "cvec")
    // per-eval probe set: top-nprobe coarse buckets (cos desc, bucket asc
    // — the ivfProbes tie-break); eval × centroids is tiny by construction
    val probes = broadcast(ev).join(broadcast(centDf))
      .select(col("eval_id"), col("qe"), col("bucket"),
        round(cosine(col("qe"), col("cvec")), roundTo).as("pcos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("eval_id").orderBy(col("pcos").desc, col("bucket"))))
      .filter(col("rn") <= nprobe)
      .select(col("eval_id"), col("qe"), col("bucket"))
    val train = df.filter(!evalPred)
    val assigned = ivfAssign(train, id, vec.cast("array<double>"), centroids)
      .select(col("id").as("train_id"), col("v"), col("bucket"))
    val sysPairs = assigned.join(broadcast(probes), "bucket")
      .select(col("eval_id"), col("train_id"),
        round(cosine(col("v"), col("qe")), roundTo).as("cos"))
    val sysTop = graft.plans.TopKPerGroup.topK(sysPairs, Seq(col("eval_id")),
        struct(col("cos"), -col("train_id")), k)
      .withColumn("rn", row_number().over(
        Window.partitionBy("eval_id").orderBy(col("cos").desc, col("train_id"))))
    val exactPairs = train
      .select(id.as("train_id"), vec.cast("array<double>").as("v"))
      .join(broadcast(ev))
      .select(col("eval_id"), col("train_id"),
        round(cosine(col("v"), col("qe")), roundTo).as("cos"))
    val rel = graft.plans.TopKPerGroup.topK(exactPairs, Seq(col("eval_id")),
        struct(col("cos"), -col("train_id")), k)
      .select(col("eval_id"), col("train_id"))
    val w = dcgWeightsMicro(k)
    val idcgMicro = w.sum
    val perQuery = sysTop.join(rel, Seq("eval_id", "train_id"))
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_hits"),
        min(col("rn")).as("first_rank"),
        sum(element_at(array(w.map(lit): _*), col("rn"))).as("dcg_micro"))
    // rr via integer `div` (not an array lookup: a 1-element literal
    // array lookup constant-folds past a null index) — 1e6 div rank is
    // the same floor value the oracle's literal table carries
    ev.select(col("eval_id"))
      .join(perQuery, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("first_rank"), lit(0)).cast("int").as("first_rank"),
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("rr_micro"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"))
      .withColumn("ndcg_ppm",
        expr(s"(dcg_micro * 1000000) div $idcgMicro"))
      .orderBy("eval_id")
  }

  /** Eval-proximity scoring — SEMANTIC targeted selection and
    * decontamination in one pass, the embedding-space twin of the
    * n-gram machinery (p52 DSIR selects by n-gram importance; p25/p51/
    * p99 decontaminate by n-gram overlap — both blind to paraphrase).
    * Every train vector gets its max cosine to a bounded eval PROBE set
    * and the probe that achieved it; from that one number fall two
    * production decisions:
    *  - `sel_rank` ∈ 1..topM — the targeted-selection shortlist (the
    *    "train on what looks like my eval/instruction distribution"
    *    move), 0 otherwise;
    *  - `contaminated` = 1 when max-cos ≥ `contamCos` — the SEMANTIC
    *    decontamination drop list n-gram overlap cannot see (a
    *    paraphrased benchmark question shares no 13-gram but sits at
    *    cosine ≈ 1).
    *
    * Scale shape: probes broadcast (an eval set is a fixed artifact —
    * the p121/g56 posture), so scoring is ONE codegen map pass over the
    * train corpus — no shuffle at all for the score; the only shuffled
    * rows are the ≤ topM shortlist through the bounded-heap operator.
    * Ties break toward the smaller probe id / smaller train id, so the
    * whole table is a pure function of the corpus.
    */
  def evalProximity(df: DataFrame, id: Column, vec: Column,
                    evalPred: Column, topM: Int, contamCos: Double,
                    roundTo: Int = 6): DataFrame = {
    require(topM >= 1, s"topM must be positive: $topM")
    val probes = broadcast(df.filter(evalPred)
      .select(id.as("probe_id"), vec.cast("array<double>").as("pe")))
    val train = df.filter(!evalPred)
      .select(id.as("train_id"), vec.cast("array<double>").as("te"))
    val best = train.crossJoin(probes)
      .select(col("train_id"), col("probe_id"),
        round(cosine(col("te"), col("pe")), roundTo).as("cos"))
      .groupBy("train_id")
      .agg(max(struct(col("cos"), (-col("probe_id")).as("neg_probe"))).as("b"))
      .select(col("train_id"), (-col("b.neg_probe")).as("best_probe"),
        col("b.cos").as("cos"))
    val shortlist = graft.plans.TopKPerGroup.topK(best, Seq(lit(1)),
        struct(col("cos"), -col("train_id")), topM)
      .withColumn("sel_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("train_id"))))
      .select(col("train_id"), col("sel_rank"))
    best.join(shortlist, Seq("train_id"), "left")
      .select(col("train_id"), col("best_probe"), col("cos"),
        coalesce(col("sel_rank"), lit(0)).cast("int").as("sel_rank"),
        when(col("cos") >= contamCos, 1).otherwise(0).cast("int")
          .as("contaminated"))
      .orderBy("train_id")
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component
    * `j` of plane `p` derives from the splitmix stream, mapped to
    * [-1, 1]. Seeded → identical across retries and executors.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    var x = seed
    def next(): Double = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0
    }
    Seq.fill(numPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign bit of one hyperplane projection. The sign tests the ROUNDED
    * dot product — the same cross-engine convention as every other
    * float comparison here: a projection within an ulp of zero must not
    * flip a bucket bit depending on an oracle's accumulation order.
    */
  private[graft] def signBit(vec: Column, plane: Seq[Double], i: Int): Column =
    when(round(dot(vec, array(plane.map(lit): _*)), 6) > 0, lit(1L << i)).otherwise(lit(0L))

  /** Random-hyperplane signature: bit `p` = sign of `v · plane_p`.
    * Returns `(id, bucket)` where bucket packs the sign bits — vectors in
    * the same bucket are ANN candidates.
    */
  def lshBuckets(df: DataFrame, id: Column, vec: Column, numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val bucket = planes.zipWithIndex.map { case (p, i) => signBit(vec, p, i) }
      .reduce((a, b) => a.bitwiseOR(b))
    df.select(id.as("id"), bucket.as("bucket"))
  }

  /** LSH-accelerated ANN: candidates share a bucket in ≥1 of `tables`
    * independent sign-LSH tables; exact cosine re-ranks candidates.
    */
  def lshTopK(df: DataFrame, id: Column, vec: Column,
              query: Seq[Double], k: Int, dim: Int,
              planesPerTable: Int = 8, tables: Int = 4): DataFrame = {
    val qDf = df.sparkSession.range(1).select(array(query.map(lit): _*).as("qv"))
    val withBuckets = (0 until tables).map { t =>
      val planes = hyperplanes(planesPerTable, dim, seed = 7L + t)
      def sig(v: Column) = planes.zipWithIndex.map { case (p, i) => signBit(v, p, i) }
        .reduce((a, b) => a.bitwiseOR(b))
      val data = df.select(id.as("id"), vec.as("v")).withColumn("bucket", sig(col("v"))).withColumn("tbl", lit(t))
      val qb = qDf.select(sig(col("qv")).as("bucket")).withColumn("tbl", lit(t))
      data.join(broadcast(qb), Seq("tbl", "bucket"), "left_semi")
    }.reduce(_ unionByName _).dropDuplicates("id")
    val q = array(query.map(lit): _*)
    withBuckets
      .select(col("id"), round(cosine(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Probability that ONE random hyperplane puts a pair with cosine
    * `cos` on the same side: `1 − θ/π` (Goemans–Williamson / Charikar's
    * sign-LSH collision bound). The building block every sign-LSH
    * cost/recall estimate derives from.
    */
  def planeCollisionProb(cos: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, cos))) / math.Pi

  /** Derive a sign-LSH configuration `(planesPerTable, tables)` from the
    * corpus size — the parameter that must NOT be a constant at scale.
    *
    * The sf1.0 rehearsal (BENCH_NOTES.md) measured why: with a fixed
    * plane count the table has a fixed `2^planes` buckets, so expected
    * occupancy is `n / 2^planes` and per-table candidate mass is
    * `n² / 2^planes` — QUADRATIC in corpus size. At 20k vectors the fixed
    * (4, 6) default generated ~75M candidates and the "scalable" LSH path
    * ran 10× slower than the brute-force broadcast loop it exists to
    * replace. Holding occupancy at `targetOccupancy` instead
    * (`planes = log2(n / targetOccupancy)`) keeps candidate work per
    * vector ~constant: `tables · targetOccupancy` comparisons each, total
    * mass LINEAR in n.
    *
    * Recall: a pair at cosine `c` collides in one table with
    * `p_planes = planeCollisionProb(c)^planes` and survives `tables`
    * independent tables with `1 − (1 − p_planes)^tables`; `tables` is the
    * smallest count reaching `targetRecall`, capped at `maxTables`. When
    * the cap binds, planes are reduced (occupancy grows past the target)
    * until recall is reachable — the honest trade-off, surfaced rather
    * than silently dropping recall: sign-LSH at LOW thresholds
    * (`minCos ≲ 0.5`, per-plane collision ≈ 0.6) needs exponentially many
    * tables, and the right engine answer there is the IVF path
    * ([[ivfTopK]]) or a higher admission threshold, not more salt.
    *
    * Uniform-occupancy assumption: real corpora skew (dense regions make
    * hot buckets); the measured [[graft.functions.Dedup.lshOccupancyProfile]]
    * Σc² is the ground truth, and [[graft.functions.Dedup.deriveSaltingThresholds]]
    * redistributes whatever mass this estimate got wrong.
    */
  def lshConfigFor(n: Long, minCos: Double, targetRecall: Double = 0.9,
                   targetOccupancy: Int = 256, maxTables: Int = 64): (Int, Int) = {
    require(n >= 1, s"corpus size must be positive: $n")
    require(targetRecall > 0 && targetRecall < 1, s"recall in (0,1): $targetRecall")
    require(targetOccupancy >= 1 && maxTables >= 1, "positive occupancy/table bounds")
    val p = planeCollisionProb(minCos)
    // ceil() sits on transcendental intermediates (log/acos/pow differ in
    // the last ulp across libm implementations); rounding to 1e-6 first
    // makes the derivation reproducible across engines — p112's DuckDB
    // oracle replays these exact formulas
    def ceil6(x: Double): Int =
      math.ceil(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toInt
    def tablesFor(planes: Int): Int = {
      val pT = math.pow(p, planes.toDouble)
      if (pT >= 1.0) 1
      else ceil6(math.log1p(-targetRecall) / math.log1p(-pT))
    }
    var planes = math.max(1,
      ceil6(math.log(n.toDouble / targetOccupancy) / math.log(2.0)))
    while (planes > 1 && tablesFor(planes) > maxTables) planes -= 1
    (planes, math.min(maxTables, tablesFor(planes)))
  }

  /** Reciprocal-rank fusion of ranked retrieval legs — the standard
    * hybrid-retrieval combiner (Cormack, Clarke & Buettcher, SIGIR '09):
    * each leg contributes `1 / (rrfK + rank)` for the ids it returned,
    * and the fused score is the sum across legs. Rank-based fusion
    * needs no score calibration between legs, which is exactly why it is
    * the default way to merge a lexical (BM25) and a dense (embedding)
    * retriever over the same corpus.
    *
    * Each leg is `(name, df)` where `df` has two columns `(id, score)`
    * and is ALREADY top-k bounded by its retriever (BM25 / ANN top-k) —
    * so the per-leg rank window runs over ≤ k rows, the pinned
    * bounded-post-aggregate class, and the fold of full-outer joins is
    * k-row × k-row: at 100 TB the corpus-sized work lives entirely in
    * the legs, never here. Ranks break ties by id (the engine-portable
    * convention used by every top-k in this library), and the fused sum
    * is a FIXED left-to-right expression tree over the legs — IEEE
    * addition order is compile-time pinned, so a SQL oracle replays it
    * bit for bit (a groupBy-sum over a union of legs would instead add
    * in partition order, which no oracle can promise to reproduce).
    *
    * Output: `(id, rank_<name>... , rrf)` — per-leg ranks are null for
    * ids a leg did not return — ordered by `(rrf desc, id)`, top `topK`.
    */
  def rrfFuse(legs: Seq[(String, DataFrame)], rrfK: Int = 60, topK: Int = 10,
              roundTo: Int = 6): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(rrfK >= 1 && topK >= 1, s"positive rrfK/topK: $rrfK/$topK")
    val names = legs.map(_._1)
    require(names.distinct.size == names.size, s"duplicate leg names: $names")
    import org.apache.spark.sql.expressions.Window
    val ranked = legs.map { case (name, df) =>
      require(df.columns.length == 2, s"leg '$name' must be (id, score)")
      val Array(idC, scoreC) = df.columns
      df.select(col(idC).as("id"),
        row_number().over(Window.orderBy(col(scoreC).desc, col(idC)))
          .cast("long").as(s"rank_$name"))
    }
    val joined = ranked.reduceLeft((a, b) => a.join(b, Seq("id"), "full_outer"))
    val rrf = names.map(n =>
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(s"rank_$n")), lit(0.0)))
      .reduceLeft(_ + _)
    joined.select(col("id") +: names.map(n => col(s"rank_$n")) :+
        round(rrf, roundTo).as("rrf"): _*)
      .orderBy(col("rrf").desc, col("id"))
      .limit(topK)
  }
}
