package graft.operators

import graft.SparkSpec
import graft.sources.TpchGraph

/** Plan audits: assert the physical plans have the shape a 100 TB run
  * needs — predicate pushdown reaching the parquet scan, column pruning,
  * broadcast joins for dimensions, TakeOrdered for top-k (no full sort).
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q05 pushes filters into the parquet scan and prunes columns") {
    val p = plan("q05_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)"), p)
    // projection pruning: the scan reads exactly the 4 needed columns
    assert(p.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"), p)
  }

  test("q02 broadcasts the dimension tables") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q03 plans top-k as TakeOrderedAndProject, not a global sort") {
    val p = plan("q03_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01 aggregate runs partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("uncached edge filter prunes non-matching union branches (no lineitem scan)") {
    import org.apache.spark.sql.functions.col
    // relType filter + constant folding must eliminate the 3 hyperedge
    // branches: scanning PlacedBy edges must not read lineitem.parquet
    val p = TpchGraph.edges(spark, sf)
      .filter(col("relType") === "PlacedBy")
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Union"), p)          // all other branches eliminated
    assert(!p.contains("l_orderkey"), p)     // no lineitem relation remains
    assert(p.contains("o_orderkey"), p)      // only the orders branch survives
  }

  test("q16 broadcasts all four dimensions around the fact joins") {
    val p = plan("q16_volume_shipping")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
  }

  test("motif negated term plans as an anti hash join, positive terms as equi-joins") {
    val p = plan("g21_motif_api")
    assert(p.contains("LeftAnti"), p)
    // no cartesian products: every positive term joined on vertex keys
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("g28 section-progress fold is one map stage + one aggregate (no joins)") {
    val p = plan("g28_section_progress")
    // the whole CompleteSection fold must be column expressions over the
    // scan — a join or driver loop here would not survive 100 TB
    assert(!p.contains("Join"), p)
    assert(p.contains("array_except"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p03 langid tokenizes once, not once per language") {
    val p = plan("p03_langid")
    // the staged markerTokens projection must survive CollapseProject:
    // one split() in the plan — langId's naive form embeds it in every
    // per-language score (4x the scan cost)
    val splits = "split\\(".r.findAllIn(p).length
    assert(splits == 1, s"expected exactly 1 split(), got $splits in:\n$p")
  }

  test("g14 stats fold parses the payload once (json_tuple, not N get_json_object)") {
    val p = plan("g14_stats_fold")
    assert(!p.contains("get_json_object"), p)
    assert("json_tuple".r.findAllIn(p).length == 1, p)
  }

  test("g14 union prunes to the orders branch and the payload encode is parallel") {
    val p = plan("g14_stats_fold")
    // branch pruning: the payload-bearing 7-branch union must collapse to
    // the single orders scan — the lineitem dedup (repartition + sort +
    // agg over the biggest table) leaking into this plan was the round-5
    // 2.2x regression shape
    assert(!p.contains("Union"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert(!p.contains("l_orderkey"), p)
    // encode parallelism: the CPU-heavy to_json must sit above a
    // round-robin exchange, not run on the scan's single input split
    assert(p.contains("RoundRobinPartitioning"), p)
  }

  test("global (unpartitioned) windows appear only in k-row post-aggregate plans") {
    import org.apache.spark.sql.execution.window.WindowExec
    // p42/p57 window over the per-source aggregate (k = #sources rows);
    // p100's quantile window runs over the binned histogram aggregate
    // (k = #distinct length bins — the constant-literal partition key
    // folds away, but the input is already bounded). Safe at any corpus
    // scale. Any OTHER query growing a global window would
    // single-partition corpus-sized data and must fail here.
    val offenders = Registry.all.flatMap { q =>
      val plan = Registry.queries(q.name)(spark, sf).queryExecution.sparkPlan
      val g = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      if (g.nonEmpty) Some(q.name) else None
    }
    // p123/p124: the water-filling sorted-prefix derivation windows over
    // the per-STRATUM mass aggregate (k = #strata rows); p127: the
    // cumulative window over the VALUE histogram (k = #distinct scores)
    // — same bounded post-aggregate class
    // p128: same strata-sized waterfill windows as p123; p129: the
    // cumulative walk over FREQUENCY-OF-FREQUENCY classes (bounded by
    // distinct frequency values)
    // p133: rrfFuse's per-leg rank windows run over legs each retriever
    // already TakeOrdered-bounded to k rows (pinned by the p133 test)
    // p138: the context-packing cumulative sum windows over the
    // retriever's TakeOrdered-bounded top-20 hits
    // p151: the shortlist rank window runs over the bounded-heap top-M
    // output (M = 50 rows by construction)
    // g73: the sweep windows run over the bounded-heap top-maxPrefix
    // vertices (20 rows); p159/p161: the CUSUM prefix windows run over
    // the hour-bucket aggregate (bounded by the time range)
    assert(offenders.toSet == Set("p42_mixture_weights", "p57_temperature_mixture",
      "p100_dataset_card", "p123_waterfill_budget", "p124_mixture_build",
      "p127_quantile_normalization", "p128_streaming_waterfill",
      "p129_vocab_coverage", "p133_hybrid_rrf", "p138_context_packing",
      "p151_semantic_decontam", "g73_sweep_cut", "p159_cusum_alarm",
      "p161_streaming_cusum"),
      offenders.toString)
  }

  test("p62 phash near-dups block on band keys — no cartesian, hamming verify on candidates") {
    val p = plan("p62_phash_near_dups")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the self-join must key on the exploded (band_idx, band_val) pair
    assert(p.contains("band_idx"), p)
    assert(p.contains("phash_bands"), p)
  }

  test("p63 routed dedup carries the route in the LSH blocking key") {
    val p = plan("p63_crosslingual_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // candidate self-join keys: (route, band, bucket) — route equality is
    // part of the join, not a post-filter (cross-language pairs must never
    // be generated, let alone verified)
    assert("route#\\d+, band#\\d+, bucket#\\d+".r.findFirstIn(p).isDefined, p)
  }

  test("p64 chunk dedup: map-side chunking, aggregate + compact hash join only") {
    val p = plan("p64_chunk_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p65/p66 media passes are single narrow stages (no join, no shuffle before the stats)") {
    // both are per-row codegen expressions over the scan: any Join in the
    // plan means the stub-decode pipeline stopped being map-side
    val p65 = plan("p65_audio_trim")
    assert(!p65.contains("Join"), p65)
    assert(p65.contains("audio_trim_stats"), p65)
    val p66 = plan("p66_scene_cuts")
    assert(!p66.contains("Join"), p66)
    assert(p66.contains("scene_cuts"), p66)
  }

  test("g36 triangles: wedge/closing joins are equi-joins; the only nested loop is the 1x1 scalar combine") {
    val p = plan("g36_triangle_counts")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("g37 pagerank: per-iteration joins are equi-joins and the top-10 is TakeOrdered") {
    val p = plan("g37_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("p67 KMV sketch: bottom-k runs through the custom TopKPerGroup operator and the kth-min side broadcasts") {
    val p = plan("p67_kmv_distinct")
    assert(p.contains("TopKPerGroup"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p68 IVF store probe: candidate selection happens as partition pruning, before any IO") {
    val p = plan("p68_ivf_store_probe")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("p69 count-min: fixed-size counter matrix broadcasts; counting aggregate is partial+final") {
    val p = plan("p69_countmin_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p70 histogram quantiles: one counting aggregate (partial+final) feeding windows, no cartesian") {
    val p = plan("p70_histogram_quantiles")
    assert(p.contains("partial_count"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("g38 incremental counts: the refresh result is served from the stored view, not the base table") {
    val p = plan("g38_incremental_counts")
    assert(p.contains("nation"), p)
    assert(!p.contains("c_custkey"), p)  // base rows never rescanned at read time
  }

  test("p71 streaming count-min: estimates serve from the merged store via broadcast join") {
    val p = plan("p71_streaming_countmin")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("g39 label propagation: per-round joins are equi-joins, top-1 label via window, no cartesian") {
    // the final registry plan starts at the last lineage cut, so pin the
    // ROUND body (one iteration, uncheckpointed input) plus the final plan
    import spark.implicits._
    val body = graft.plans.LabelPropagation.run(
        Seq(("a", "b"), ("b", "c")).toDF("u", "v"), iters = 1)
      .queryExecution.executedPlan.toString
    assert(body.contains("Window"), body)
    assert(!body.contains("CartesianProduct") && !body.contains("BroadcastNestedLoopJoin"), body)
    val p = plan("g39_label_propagation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p72 containment: the gram join is the only pair generator (no cartesian)") {
    val p = plan("p72_containment_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p73 frame samples: codegen cut pass + per-doc window, no join anywhere") {
    val p = plan("p73_frame_samples")
    assert(!p.contains("Join"), p)
    assert(p.contains("scene_cuts") && p.contains("Window"), p)
  }

  test("p74 salted agg: two HashAggregate phases over (key, salt) then key, no join") {
    val p = plan("p74_salted_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // partial+final per phase
    assert(!p.contains("Join"), p)
  }

  test("g40 bucketed traverse: both scans bucketed, the only shuffle is the final aggregate") {
    val p = plan("g40_bucketed_traverse")
    // the join itself must not reshuffle either side — at toy scale the
    // planner may pick broadcast over the bucketed SMJ, but a shuffle of
    // key/src would defeat the layout in both shapes
    assert("Bucketed: true".r.findAllIn(p).size == 2, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p) // groupBy(dst) only
    assert(!p.contains("Exchange hashpartitioning(key") &&
      !p.contains("Exchange hashpartitioning(src"), p)
  }

  test("p28 repetition tokenizes once (filter must not re-derive the split)") {
    val p = plan("p28_repetition")
    // the no-token filter is a cheap rlike on the raw text; a size(toks)>0
    // filter gets pushed below the staging projection and re-derives the
    // whole tokenization per row
    val splits = "split\\(".r.findAllIn(p).length
    assert(splits == 1, s"expected exactly 1 split(), got $splits in:\n$p")
    assert("max_run_count".r.findAllIn(p).length == 2, p)
  }

  test("p33 packing shuffles exactly once (on the shard key)") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Packing
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Packing.packSequences(docs, col("doc_id"), col("text"), col("source"), 256)
      .queryExecution.executedPlan.toString
    // one hash exchange feeding the per-shard window — a second shuffle
    // (or a single-partition global window) would not survive 100 TB
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 Exchange, got $exchanges in:\n$p")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("p34 PII scrub is a pure narrow projection (no exchange, pruned scan)") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Scrub
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Scrub.scrubPii(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("p35 semdedup: pair join is cluster-keyed; products only for centroid assignment") {
    val p = plan("p35_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    // the PAIR generator is r16's join-free bucketPairs: entries
    // collect per CLUSTER key and pairs generate in-partition — no join
    // may carry id_a/id_b at all (the n×n danger this pin exists for:
    // an un-keyed pair join would be a corpus product)
    val pairLines = p.split("\n")
      .filter(l => l.contains("id_a") && l.contains("id_b") && l.contains("Join"))
    assert(pairLines.isEmpty, p)
    // the cluster-keyed collect that feeds pair generation must exist
    assert(p.contains("collect_list"), p)
    assert(p.contains("hashpartitioning(cluster"), p)
    // nested-loop products are allowed ONLY as the coarse-cell
    // assignment's bounded broadcast side (K1 = ceil(sqrt(K)) rows,
    // BuildRight Cross) — never an unbroadcast product
    assert(p.split("\n").filter(_.contains("NestedLoopJoin"))
      .forall(_.contains("BuildRight, Cross")), p)
    // the rows×fine-centroids join is cell-keyed and SORT-MERGE: a
    // broadcast here would ship a K-proportional table (K = ceil(n/64)
    // grows with the corpus — the r15 scale ceiling this pin closes)
    val cclLines = p.split("\n").filter(l => l.contains("Join [ccl"))
    assert(cclLines.nonEmpty, p)
    assert(cclLines.forall(_.contains("SortMergeJoin [ccl")), p)
    // fine centroids are elected per cell (row_number + count windows
    // partitioned on ccl), never by a global corpus-wide sort-limit
    assert(p.contains("row_number() windowspecdefinition(ccl"), p)
    assert(p.contains("count(1) windowspecdefinition(ccl"), p)
    // the only TakeOrdered is the K1-row coarse selection — sqrt-scale
    assert(p.split("\n").filter(_.contains("TakeOrderedAndProject"))
      .forall(_.contains("output=[cluster")), p)
  }

  test("p36 epoch shuffle is a range-partitioned sort, not a global window") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Sampling
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Sampling.shuffleOrder(docs, col("doc_id"), "e:")
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("p40 boilerplate joins the heavy-hitter lexicon broadcast; doc text never sort-merges") {
    val p = plan("p40_boilerplate_lines")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("p41 token budget is one stratum-keyed window, no extra exchanges") {
    val p = plan("p41_token_budget")
    // one hashpartitioning exchange for the per-source window; the final
    // orderBy adds a range exchange; nothing else may shuffle
    val hashEx = "hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx in:\n$p")
  }

  test("p43 quality gate is a pure narrow projection (no hash exchange, pruned scan)") {
    val p = plan("p43_quality_gate")
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("p44 dup-ngram signals tokenize once and never shuffle (native run-scan)") {
    val p = plan("p44_dup_ngrams")
    assert(!p.contains("hashpartitioning"), p)
    assert("split\\(lower".r.findAllIn(p).length == 1, p)
    assert(p.contains("dup_gram_count"), p)
  }

  test("p45 shared-fp coverage: partial-combined frequency + splittable join, NO window") {
    // r17 (verdict ask #2): the r16 window count colocated every
    // occurrence of one hot fingerprint in ONE un-splittable window
    // partition; the shape is now a partial-combined frequency aggregate
    // (hot fps collapse map-side) + a merge-pinned equi-join back that
    // AQE can skew-split — so no Window may appear, the frequency
    // aggregate must have a partial phase, and the join must be the
    // sort-merge form (a broadcast would be the p118 corpus-side class)
    val p = plan("p45_shared_fp_coverage")
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p46 PQ encode+ADC is one codegen stage with TakeOrdered top-k, zero exchanges") {
    val p = plan("p46_pq_adc")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
    assert(p.contains("array_dot"), p)
    assert(p.contains("*(1) Project"), p)
  }

  test("p47 top n-grams partially aggregates before the exchange; top-k is TakeOrdered") {
    val p = plan("p47_top_ngrams")
    assert(p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("p48 funnel: gate rules push into the scan filter; eval fps broadcast; no cartesian") {
    val p = plan("p48_curation_funnel")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the gate's rule predicates evaluate as scan-adjacent Filter, not a
    // post-shuffle stage: quality_counts appears inside a Filter node
    assert(p.contains("Filter ") && p.contains("quality_counts"), p)
  }

  test("p49 JSONL parse is map-side: one from_json, pruned scan, no hash exchange") {
    val p = plan("p49_jsonl_ingest")
    assert(!p.contains("hashpartitioning"), p)   // only the orderBy's range exchange
    assert(!p.contains("Join"), p)
    assert("from_json".r.findAllIn(p).length == 1, p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"), p)
  }

  test("p50 LM scoring broadcasts the model; doc agg partially aggregates; no cartesian") {
    val p = plan("p50_lm_quality")
    // the bigram-LM and context tables ship to every node (the KenLM
    // distribution design) — the corpus side must never sort-merge
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_sum") && p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p51 Bloom prefilter runs as a scan-stage Filter before the confirm join") {
    val p = plan("p51_bloom_decontamination")
    // the sketch probe must sit in a Filter BELOW the join (prefilter,
    // not post-join cleanup) and nothing may plan a cartesian
    assert(p.contains("Filter"), p)
    val probeAt = p.indexOf("UDF")
    val joinAt = math.max(p.indexOf("Join"), p.indexOf("join"))
    assert(probeAt > 0 && joinAt > 0 && probeAt > joinAt, p) // deeper in the tree = later in text
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p52 DSIR scoring joins nothing and partial-aggregates per doc inside codegen") {
    val p = plan("p52_dsir_importance")
    // the log-ratio array is a literal — scoring is explode + doc-keyed
    // aggregate; no join anywhere, and the shuffle input is the partial
    // (count, Σ lr_micro) rows, never the grams
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count") && p.contains("partial_sum"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("p54 BPE pairs: pair agg runs above the vocab agg, top-N is TakeOrdered") {
    val p = plan("p54_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p)  // no global sort
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("Join"), p)
  }

  test("q18 aggregates lineitem before any join; raw lineitem never reaches a join") {
    val p = plan("q18_large_orders")
    // textual order: the deepest operator prints last — the lineitem
    // scan must feed a HashAggregate below the first join
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_sum"), p)
    val aggAt = p.lastIndexOf("HashAggregate")
    val liScanAt = p.lastIndexOf("lineitem.parquet")
    assert(aggAt > 0 && liScanAt > aggAt, p) // scan sits under an aggregate
  }

  test("q19 broadcasts the pre-filtered part side; brand/size filters push to its scan") {
    val p = plan("q19_disjunctive_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    // the brand/size disjunction pushes into the part scan…
    assert(p.contains("And(EqualTo(p_brand,Brand#12)"), p)
    // …and Catalyst derives the OR'd quantity ranges onto the fact scan
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p55 fuzzy linkage: distinct-collapse under the join, threshold-form levenshtein") {
    val p = plan("p55_fuzzy_pairs")
    // the distinct-string collapse (partial_min) must sit BELOW the
    // block-key join, and the verify must be the early-abandon
    // threshold form, not the unbounded one
    assert(p.contains("partial_min"), p)
    assert(p.contains("levenshtein") && p.contains("Some(3)"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p56 source overlap: (source, fp) dedup runs below the self-join") {
    val p = plan("p56_source_overlap")
    // both join inputs must already be the DISTINCT (source, fp)
    // aggregates — joining raw fingerprint postings would re-create the
    // doc-level f-squared blowup the operator exists to avoid
    val joinAt = p.indexOf("Join")
    val aggAt = p.lastIndexOf("HashAggregate")
    assert(joinAt > 0 && aggAt > joinAt, p) // aggregates print deeper than the join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p59 k-sigma: one entity window, integer filter, no joins") {
    val p = plan("p59_ksigma_anomalies")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<event_id:bigint,ts:bigint,user_id:bigint,value:double>") ||
           p.contains("user_id"), p) // pruned scan: only the 4 needed columns
  }

  test("p60 funnel: user-keyed equi-joins only, partial-aggregated frontiers") {
    val p = plan("p60_funnel")
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("similarity scan keeps the native dot product inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Similarity
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" spans mark codegen stages; the projection with array_dot
    // must be inside one (HOF formulations fall out of codegen)
    assert(p.contains("*(1) Project"), p)
    assert(p.contains("array_dot"), p)
  }

  test("p81 heavy-hitter confirm filters candidates below the aggregate; no window, no join") {
    val p = plan("p81_heavy_hitters_mg")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(!p.contains("WindowExec") && !p.contains("Join"), p)
    // the candidate in-filter runs before the confirm aggregate
    assert(p.contains(" IN ") || p.contains("INSET"), p)
  }

  test("p83 shard manifest is one map-side-combined aggregate (no lists, no window)") {
    val p = plan("p83_shard_manifest")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("collect_list") && !p.contains("WindowExec"), p)
  }

  test("p84 zorder bucketing is pure arithmetic feeding one aggregate (codegen, no UDF)") {
    val p = plan("p84_zorder_layout")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p85 hard negatives broadcast the anchors and rank via TopKPerGroup (no window sort)") {
    val p = plan("p85_hard_negatives")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("g44 optional motif plans the optional term as an outer join, no cartesian") {
    val p = plan("g44_optional_motif")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("g45 var-length motif: k-hop chains are equi-joins (relType filter constant-folds away)") {
    val p = plan("g45_varlength_motif")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the seeded edge source generates ONLY Next edges, so the relType
    // filter is folded out entirely — the hop joins must be hash joins
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("p92 props extraction stays in the scan projection (no UDF, partial agg)") {
    val p = plan("p92_props_extract")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("p93 source dup-mass: chunk hash agg partial-combines; doc join is hash, not nested-loop") {
    val p = plan("p93_source_dup_mass")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q20 compiles both quantifiers to semi/anti joins; supplier dim broadcasts") {
    val p = plan("q20_waiting_suppliers")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("p87 stream-static dim lookup broadcasts in the batch twin") {
    // pin the batch-equivalent join shape (the streaming plan itself is
    // per-microbatch): dim side must broadcast, stream side must not sort
    import org.apache.spark.sql.functions._
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val p = TpchGraph.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy("n_name").agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cdcChunks is shuffle-free: scan -> codegen cuts -> explode, no Exchange") {
    import org.apache.spark.sql.functions.col
    val p = graft.functions.Packing.cdcChunks(
        spark.read.parquet(s"$sf/documents.parquet"), col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)   // map-side at any corpus size
    assert(p.contains("Generate"), p)    // the per-chunk explode
    assert(p.contains("cdc_cuts"), p)    // the codegen expression, not a HOF
  }

  test("canonicalize fingerprint is one scan, no shuffle before the caller aggregates") {
    import org.apache.spark.sql.functions.{col, md5}
    val p = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(graft.functions.TextOps.canonicalize(col("text"))).as("fp"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("unicode_norm"), p)
  }

  test("p22 LSH pairs: join-free — bucket collect + in-partition pairs, cosine verifies before the distinct") {
    // the r16 shape (bucketPairs): the bucketed vector rows shuffle ONCE
    // into per-(tbl, bucket) collect_list buckets, pairs generate
    // in-partition, and the rounded-cosine filter gates BEFORE the
    // distinct so only survivors shuffle again. No join may appear
    // anywhere: a join means either the r15 two-Exchange self-join
    // regressed back in, or worse, the candidate-ids→distinct→fetch
    // shape (three shuffles of the per-bucket-quadratic candidate set,
    // the sf1.0-measured 139 s cliff of BENCH_NOTES round 9).
    val p = plan("p22_lsh_near_dups")
    assert(!p.contains("Join"), p)
    assert(p.contains("collect_list"), p)
    // pair explode present (two Generates: posexplode + slice explode)
    assert("Generate".r.findAllIn(p).size >= 2, p)
  }

  test("p103 salted LSH: hot-bucket list broadcasts, shard fan-out is a Generate, no nested loops") {
    val p = plan("p103_lsh_salted_pairs")
    // the occupancy-derived hot list must reach the bucketed rows as a
    // broadcast (it is bounded by n·tables/hotThreshold rows); the join
    // keyed on (tbl, bucket, i, j) and the candidate-verify joins must
    // all be hash equi-joins — any nested-loop here is the all-pairs
    // explosion the operator exists to avoid
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate explode"), p) // sequence() shard replication
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p116 interval overlap: the banded join is an equi hash join, never a nested loop") {
    // the operator exists to replace filter-after-cross-product with an
    // equi-join on (key, bucket); a nested loop anywhere means Catalyst
    // fell back to the per-key cross product the banding avoids
    val p = plan("p116_interval_overlap_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate explode"), p) // bucket fan-out is a Generate
  }

  test("p118 skip-gram pairs: position join is an equi-join, pair agg partial-combines") {
    val p = plan("p118_skipgram_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // BOTH sides of the (doc_id, pos) self-join are corpus-sized, but
    // below an explode the planner's size estimate is the compressed
    // file size and reads broadcast-small — at mem2g×sf4.0 the chosen
    // broadcast build side deserialized into one 512 MB allocation and
    // OOMed the 2 GiB executor. The join must plan sort-merge.
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    // hot stopword pairs must pre-collapse map-side
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    // top-40 is TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("g54 random walks: per-step frontier joins are hash equi-joins on the current node") {
    val p = plan("g54_random_walks")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the ranked adjacency is materialized once: the step joins read
    // checkpointed blocks (Scan ExistingRDD), not a re-derived window
    assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"), p)
  }

  test("p131 CDC compaction is one max_by aggregate: no window, no join, one hash exchange") {
    val p = plan("p131_cdc_compaction")
    // struct-valued max_by compiles to SortAggregate (local sorts only —
    // the data moves once); the partial_ prefix proves the map-side
    // combine that makes the winner-per-key linear in CHANGES, not a
    // per-key window over the whole feed
    assert(p.contains("partial_max_by"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    // exactly one data exchange (the key hash) + the output ordering's
    // range exchange — a second hash exchange would mean the winner is
    // being recomputed
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("g60 DOULION: the sampling coin is a Filter on the edge derivation, below every pair join") {
    // the census localCheckpoints its canonical edge set, so the final
    // g60 plan reads ExistingRDD blocks — audit the sparsify stage (the
    // exact plan the checkpoint job runs) directly
    val p = graft.plans.Triangles
      .sparsify(TpchGraph.copurchaseEdges(spark, sf), p = 0.5)
      .queryExecution.executedPlan.toString
    // the md5-threshold coin must run where the edges are produced, not
    // after any wedge join — the p² wedge-mass saving happens only if
    // candidate wedges are generated from the SPARSIFIED edge set
    val firstCoin = p.indexOf("conv(substring(md5")
    assert(firstCoin >= 0, p)
    // plans print top-down, so "coin below every pair join" means no
    // join text ahead of the first coin occurrence (the co-purchase
    // self-join that DERIVES the edges legitimately sits below it)
    assert(!p.substring(0, firstCoin).contains("HashJoin") &&
      !p.substring(0, firstCoin).contains("SortMergeJoin"),
      s"coin filter must not sit above a pair join\n$p")
  }

  test("g60 census on the sparsified graph: equi-joins only, 1x1 scalar combine is the sole nested loop") {
    val p = plan("g60_approx_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("p133 RRF: both legs are TakeOrdered top-k; the fusion never joins corpus-sized inputs") {
    val p = plan("p133_hybrid_rrf")
    // corpus-sized work lives in the legs — each must bound itself with
    // TakeOrderedAndProject before the fusion's rank windows / full-outer
    // join ever see a row
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    // the BM25 leg's 1-row corpus-stats broadcast is the sole permitted
    // nested-loop combine (the pinned scalar pattern, as in g60)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    // the per-leg rank window runs over a k-row input: every Window in
    // the plan must sit ABOVE a TakeOrdered (plans print top-down, so
    // the last Window offset precedes the last TakeOrdered offset)
    val lastWindow = p.lastIndexOf("Window")
    assert(lastWindow < p.lastIndexOf("TakeOrderedAndProject"), p)
  }

  test("p134 matryoshka audit: two TakeOrdered scans, 10-row overlap join broadcasts") {
    val p = plan("p134_matryoshka_recall")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
    // the overlap join of two top-10 id sets must broadcast, not shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("p135 quantized search: map-side codegen score, TakeOrdered candidates, no explode") {
    val p = plan("p135_quantized_recall")
    // the integer-dot score must be a per-row scalar expression over the
    // vector column — a posexplode/higher-order formulation would shuffle
    // corpus × dim rows
    assert(!p.contains("Generate"), p)
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
    // the 10-row overlap join broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("g61 MIS round stage: map-side priority + map-side-combined min, no join at all") {
    import org.apache.spark.sql.functions._
    // the trajectory output is a collected LocalTableScan — audit the
    // per-round neighborhood-min stage (the exact plan each round runs)
    val und = TpchGraph.copurchaseEdges(spark, sf)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    val adj = und.select(col("u").as("x"), col("v").as("y"))
      .unionAll(und.select(col("v").as("x"), col("u").as("y")))
    val p = graft.plans.Mis.neighborhoodMin(adj, id => id * 7L)
      .queryExecution.executedPlan.toString
    // map-side combine: the min aggregates partially before the key
    // exchange — the shape that keeps each round one shuffle of the
    // (halving) active adjacency; the priority is computed map-side
    // (pure function of the id), so the stage has NO join whatsoever
    assert(p.contains("partial_min"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("g63 HyperANF round stage: 16 map-side-combined maxes, one hash join, no explode") {
    import org.apache.spark.sql.functions._
    // audit the per-round register-max plan (trajectory output is collected)
    val und = TpchGraph.copurchaseEdges(spark, sf)
    val adj = und.select(col("u").as("x"), col("v").as("y"))
      .unionAll(und.select(col("v").as("x"), col("u").as("y")))
    val vs = adj.select("x").distinct()
    val adjSelf = adj.unionAll(vs.select(col("x"), col("x").as("y")))
    val regs = graft.plans.HyperAnf.initRegisters(vs, "anf:")
    val p = graft.plans.HyperAnf.roundMax(adjSelf, regs)
      .queryExecution.executedPlan.toString
    // the element-wise register max must be column aggregates with a
    // partial (map-side) phase — an array/explode formulation would
    // shuffle V × 16 exploded rows instead of V wide rows
    assert("partial_max".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("g65 incremental census: equi-joins only; scalar combines are the sole nested loops") {
    val p = plan("g65_incremental_triangles")
    // every pair join (delta attribution + the embedded base census) is
    // an equi-join — sort-merge or hash, never a cartesian; the only
    // nested loops are the 1x1 scalar combines assembling the single
    // output row (3 crossJoins + the census's edge/wedge combine)
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 4, p)
  }

  test("g64 SCC propagate stage: delta messages only, map-side-combined min, hash joins") {
    import org.apache.spark.sql.functions._
    val ed = spark.range(100).select(col("id").as("src"), ((col("id") * 7) % 100).as("dst"))
    val verts = ed.select(col("src").as("x")).distinct()
    val state = verts.select(col("x"), col("x").as("lbl"))
    // a SHRUNK delta (10 of 100 labels improved last round): the message
    // join must be keyed on the delta, not the full state
    val delta = state.filter(col("x") < 10)
    val (merged, nextDelta) = graft.plans.SccLabels.propagate(ed, state, delta)
    for (df <- Seq(merged, nextDelta)) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("partial_min"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("Window"), p)
    }
  }

  test("g62 matching round stage: map-side-combined incident min + hash equi-joins only") {
    import org.apache.spark.sql.functions._
    // audit the per-round selection plan (trajectory output is collected)
    val e = TpchGraph.copurchaseEdges(spark, sf)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .select(col("u"), col("v"),
        md5(concat(lit("match:"), col("u").cast("string"), lit(":"),
          col("v").cast("string"))).as("pe"))
    val p = graft.plans.Matching.roundSelect(e)
      .queryExecution.executedPlan.toString
    // the per-vertex incident min partially aggregates before its key
    // exchange — one shuffle of the (dropping) edge set per round
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("g80 weighted pagerank readout: bounded-heap top-15, no window/cartesian") {
    // the iteration itself is lineage-cut per round (localCheckpoint), so
    // the executed plan shows only the readout; the per-round shape is the
    // same contrib-join + partial_sum stage the uniform pagerank runs
    val p = plan("g80_weighted_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("g81 betweenness readout: map-side-combined delta sum, no window/cartesian") {
    val p = plan("g81_betweenness")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("p167 representative election ranks via TopKPerGroup (no window sort)") {
    val p = plan("p167_dedup_representatives")
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("WindowExec"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p165 kappa: one corpus aggregate, label-sized tail (scalar crossJoins only)") {
    val p = plan("p165_rater_agreement")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("WindowExec"), p)
    // the verdict broadcast is the only nested-loop combine
    assert(!p.contains("CartesianProduct"), p)
  }

  test("g84 triangle-list checksum answers from a PURE store scan: no joins at all") {
    // the stored list makes the checksum a scan+aggregate; any Join in
    // this plan means the wedge enumeration leaked back in
    val p = plan("g84_triangle_list_store")
    assert(p.contains("Scan parquet") || p.contains("FileScan"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("g85 coarsen-store checksums answer from store scans: no matching/contraction joins") {
    val p = plan("g85_coarsen_store")
    assert(!p.contains("Join"), p)
    assert(p.contains("Scan parquet") || p.contains("FileScan"), p)
  }

  test("g65 store-backed census: t_base is a stored-list count, not a wedge enumeration") {
    // the attribution joins are delta-driven; the BASE census term must
    // be an aggregate over the stored triangle-list scan. Count the
    // wedge-shaped self-join signature: the full inline census has TWO
    // sort-merge/shuffled joins over the SAME oriented edge set feeding
    // a range condition; the store-backed plan has only the delta
    // attribution joins. Weaker proxy pinned here: the plan must scan
    // the store's parquet (the bucketed artifacts) at least twice
    // (base edges + base triangle list).
    val p = plan("g65_incremental_triangles")
    assert("Scan parquet".r.findAllIn(p).size + "FileScan".r.findAllIn(p).size >= 2, p)
  }
}
