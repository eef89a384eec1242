package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat near the river bank"), // near dup of 1
    (4L, "completely different content about spark distributed query engines"),
    (5L, "THE  Quick   Brown fox jumps over the lazy dog near the river bank") // fingerprint dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup clusters identical texts") {
    val clusters = Dedup.exactClusters(docs, col("doc_id"), col("text")).collect()
    val dupCluster = clusters.find(_.getLong(2) == 2L)
    assert(dupCluster.exists(_.getLong(1) == 1L)) // keep_id = min
    assert(clusters.length == 4)
  }

  test("fingerprint dedup is case/whitespace-insensitive") {
    val clusters = Dedup.fingerprintClusters(docs, col("doc_id"), col("text")).collect()
    assert(clusters.length == 3) // {1,2,5}, {3}, {4}
    assert(clusters.exists(r => r.getLong(2) == 3L && r.getLong(1) == 1L))
  }

  test("jaccardPairs finds near-duplicates via inverted-index join") {
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0)) // exact dup
    val nearDup = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(nearDup.exists(p => p._3 > 0.5 && p._3 < 1.0))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L)) // unrelated doc excluded
  }

  test("jaccardPairs doc-frequency cap drops hot-gram-only pairs, keeps rare-gram near-dups") {
    import spark.implicits._
    // every doc shares the hot running phrase; only 1/2 share rare tails
    val corpus = Seq(
      (1L, "common shingle text alpha beta gamma"),
      (2L, "common shingle text alpha beta delta"),
      (3L, "common shingle text zzz yyy xxx"),
      (4L, "common shingle text qqq www eee")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(corpus, col("doc_id"), col("text"), 3, 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "common shingle text" grams appear in all 4 docs → every pair shares a gram
    assert(uncapped.size == 6)
    val capped = Dedup.jaccardPairs(corpus, col("doc_id"), col("text"), 3, 0.01,
      maxGramDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // only the rare-gram pair (1,2) survives the index cap...
    assert(capped.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    // ...and its jaccard is a lower bound of the uncapped value
    val exact = Dedup.jaccardPairs(corpus, col("doc_id"), col("text"), 3, 0.01)
      .filter(col("id_a") === 1 && col("id_b") === 2).head().getDouble(2)
    assert(capped.head._3 <= exact)
  }

  test("minHashNearDups recovers exact-Jaccard answer via LSH candidates") {
    val expected = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.minHashNearDups(docs, col("doc_id"), col("text"),
        n = 3, numHashes = 64, bands = 32, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
  }

  test("embeddingNearDupsLsh: exact precision, high recall vs brute force at near-dup threshold") {
    import spark.implicits._
    val dim = 16
    val rng = new scala.util.Random(11)
    val base = (0 until 200).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextFloat() * 2 - 1)))
    // plant 20 noisy near-duplicates of the first 20 vectors
    val dups = (0 until 20).map(i =>
      (1000L + i, base(i)._2.map(x => x + rng.nextFloat() * 0.01f)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val brute = Dedup.embeddingNearDups(df, col("vec_id"), col("embedding"), minCos = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupsLsh(df, col("vec_id"), col("embedding"),
        minCos = 0.95, dim = dim, planesPerTable = 4, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))               // exact verify → perfect precision
    assert(brute.nonEmpty)
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${brute.size})")
  }

  test("default (unspecified) LSH shape derives from corpus size and equals the explicit derived config") {
    import spark.implicits._
    val dim = 16
    val rng = new scala.util.Random(17)
    val base = (0 until 300).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextFloat() * 2 - 1)))
    val dups = (0 until 30).map(i =>
      (1000L + i, base(i)._2.map(x => x + rng.nextFloat() * 0.01f)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (planes, tables) = Similarity.lshConfigFor(330L, 0.95)
    val derived = rows(Dedup.embeddingNearDupsLsh(
      df, col("vec_id"), col("embedding"), minCos = 0.95, dim = dim))
    val explicit = rows(Dedup.embeddingNearDupsLsh(
      df, col("vec_id"), col("embedding"), minCos = 0.95, dim = dim,
      planesPerTable = planes, tables = tables))
    assert(derived == explicit)
    assert(derived.nonEmpty)
    // a half-specified shape is a caller bug, not a silent default
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupsLsh(df, col("vec_id"), col("embedding"),
        minCos = 0.95, dim = dim, planesPerTable = 4)
    }
  }

  test("embeddingNearDupsLshSalted: bit-identical to the plain path while salting executes") {
    import spark.implicits._
    val dim = 16
    val rng = new scala.util.Random(11)
    val base = (0 until 200).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextFloat() * 2 - 1)))
    val dups = (0 until 20).map(i =>
      (1000L + i, base(i)._2.map(x => x + rng.nextFloat() * 0.01f)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = rows(Dedup.embeddingNearDupsLsh(
      df, col("vec_id"), col("embedding"), minCos = 0.95, dim = dim))
    // thresholds far below the 220-vector corpus so hot buckets genuinely
    // shard (16 buckets × 220 rows ⇒ average occupancy ≫ 8)
    val salted = rows(Dedup.embeddingNearDupsLshSalted(
      df, col("vec_id"), col("embedding"), minCos = 0.95, dim = dim,
      hotThreshold = 8, shardTarget = 4))
    assert(salted == plain)
    // degenerate shard sizes must not change the answer either
    val salted1 = rows(Dedup.embeddingNearDupsLshSalted(
      df, col("vec_id"), col("embedding"), minCos = 0.95, dim = dim,
      hotThreshold = 1, shardTarget = 1))
    assert(salted1 == plain)
  }

  test("minhash signature: identical texts get identical signatures; est≈1") {
    val sigs = Dedup.minHashSignature(docs, col("doc_id"), col("text"), 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    assert(sigs.values.forall(_.length == 64))
  }

  test("simhash: identical texts identical; near-dups close in Hamming distance") {
    val sh = Dedup.simHash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
    assert(ham(sh(1L), sh(3L)) <= 16)
  }

  test("sharedFingerprintCoverage: copies share everything, uniques nothing") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact copy of 1
      (3L, "zq xv jkw qqz vxj kzz wqx zzv xqk jjw zkq"), // disjoint alphabet: no 5-gram overlap
      (4L, "abc") // shorter than k=5 → no fingerprints, dropped
    ).toDF("doc_id", "text")
    val out = Dedup.sharedFingerprintCoverage(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == out(2L))                         // symmetric by construction
    assert(out(1L)._3 == 1.0 && out(1L)._2 == out(1L)._1) // every fp shared with the copy
    assert(out(3L)._2 == 0 && out(3L)._3 == 0.0)       // nothing shared
    assert(out.values.forall(v => v._2 <= v._1))
  }

  test("bloomDecontaminate equals the exact join: leaks flagged, clean docs and FPs absent") {
    import spark.implicits._
    val evalText = "the quick brown fox jumps over the lazy dog near the riverbank"
    val docs = Seq(
      (97L, evalText),                                 // eval (id % 97 == 0)
      (1L, evalText),                                  // full leak
      (2L, "completely different content with no shared substrings at all xyz"),
      (3L, s"prefix padding $evalText suffix padding") // embedded leak
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
      explode(TextOps.winnowingFingerprints(col("text"), k = 5, w = 8)).as("fp"))
    val train = fps.filter(col("doc_id") % 97 =!= 0)
    val eval_ = fps.filter(col("doc_id") % 97 === 0)
    val bloom = Dedup.bloomDecontaminate(train, eval_, minShared = 3,
        expectedEvalFps = 1000L, fpp = 0.01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: plain exact join, no sketch
    val exact = train.join(eval_.select("fp").distinct(), "fp")
      .groupBy("doc_id").agg(countDistinct(col("fp")).as("n"))
      .filter(col("n") >= 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    assert(bloom.contains(1L) && bloom.contains(3L) && !bloom.contains(2L))
  }

  test("fused minhash signature equals the array-expression recurrence, value for value") {
    import graft.functions.expressions.MinHashSigs
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 40)
    val grams = Dedup.wordNgrams(docs, col("doc_id"), col("text"), 3)
    val hashed = grams.withColumn("h", Dedup.gramHash(col("gram")))
      .groupBy("id").agg(collect_list(col("h")).as("hs"))
    val p = (1L << 31) - 1
    val legacy = array(Dedup.permutationParams(64).map { case (a, b) =>
      array_min(transform(col("hs"), h => pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
    val both = hashed.select(col("id"), legacy.as("l"),
      MinHashSigs.minHashSigCol(col("hs"), 64).as("f"))
    assert(both.count() > 0)
    assert(both.filter(not(col("l") === col("f"))).count() == 0)
    // and the duplicated splitmix recurrence stays in lockstep
    val ps = MinHashSigs.params(64, 42L).grouped(2).map(a => (a(0), a(1))).toSeq
    assert(ps == Dedup.permutationParams(64))
  }


  test("routed near-dups: pairs only within a route; same text across routes excluded") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val t2 = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, t1, "en"), (2L, t1, "en"),          // same route → pair
      (3L, t1, "de"),                          // same text, other route → NO pair with 1/2
      (4L, t2, "de"), (5L, t2, "de"),          // same route → pair
      (6L, "unrelated words entirely distinct from everything else here", "en")
    ).toDF("id", "text", "lang")
    val got = Dedup.minHashNearDupsRouted(docs, col("id"), col("text"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(("en", 1L, 2L, 1.0), ("de", 4L, 5L, 1.0)), got.toString)
  }

  test("routed near-dups agree with unrouted on a single-route corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 80).select(col("doc_id"), col("text"))
    val unrouted = Dedup.minHashNearDups(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val routed = Dedup.minHashNearDupsRouted(docs, col("doc_id"), col("text"), lit("x"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(routed == unrouted, s"routed=$routed unrouted=$unrouted")
  }

  test("fuzzyPairs: within-block threshold matches; cross-block pairs never compared") {
    import spark.implicits._
    val recs = Seq(
      (10L, "linen chocolate navy"),   // dist 1 from 20
      (20L, "linen chocolate wavy"),
      (30L, "linen cornsilk powder"),  // dist 7 from 10 — over threshold
      (40L, "azure chocolate navy"),   // dist 1 from 10 but different block
      (50L, "linen chocolate navy"),   // exact dup of 10 → collapsed, min id kept
      (60L, "linen chocolate naby")    // dist 1 from 10/50, 2 from 20
    ).toDF("id", "name")
    val pairs = Dedup.fuzzyPairs(recs, col("id"), col("name"),
        split(col("name"), " ").getItem(0), maxDist = 2)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // 50 collapses into 10; 40's block ("azure") has no partner; 30 too far
    assert(pairs == Seq((10L, 20L, 1), (10L, 60L, 1), (20L, 60L, 2)), pairs.toString)
  }

  test("containment catches a full quote that Jaccard misses at any sane threshold") {
    val page = (1 to 80).map(i => s"body$i").mkString(" ")
    val quote = (10 to 21).map(i => s"body$i").mkString(" ")  // 12 tokens inside page
    val corpus = Seq(
      (1L, page),
      (2L, quote),
      (3L, (1 to 30).map(i => s"other$i").mkString(" "))  // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, col("doc_id"), col("text"),
        n = 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // quote: 10 distinct 3-grams, all inside page → containment 1.0
    assert(got == Seq((2L, 1L, 1.0)), got.toString)
    // the same pair is invisible to symmetric Jaccard: 10 shared / 78+10-10
    val jac = Dedup.jaccardPairs(corpus, col("doc_id"), col("text"),
        n = 3, minJaccard = 0.5).count()
    assert(jac == 0)
  }

  test("containment tie on equal sizes reports the smaller id as contained") {
    val corpus = Seq(
      (7L, "alpha beta gamma delta epsilon"),
      (4L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, col("doc_id"), col("text"),
        n = 2, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((4L, 7L)), got.toString)
  }

  test("clusterWeights: transitive cluster members weigh 1/n, singletons weigh 1") {
    import spark.implicits._
    // chain 1~2~3 (one 3-cluster even though 1!~3), pair 10~11, singleton 20
    val universe = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.clusterWeights(universe, col("id"), pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 333333L)) && got(2L) == ((1L, 333333L))
      && got(3L) == ((1L, 333333L)))
    assert(got(10L) == ((10L, 500000L)) && got(11L) == ((10L, 500000L)))
    assert(got(20L) == ((20L, 1000000L)))
    // conservation-ish: weights are exactly scale div n (integer floor)
    assert(got.values.map(_._2).sum == 3 * 333333L + 2 * 500000L + 1000000L)
  }

  test("duplicateSpans marks shared passages at any alignment and merges overlaps") {
    import spark.implicits._
    // docs 1/2 share one 10-token passage at DIFFERENT offsets; doc 3
    // repeats a 4-gram internally (invisible at k=4 only if unique);
    // doc 4 is clean; doc 5 is too short for any gram
    val shared = "one two three four five six seven eight nine ten"
    val corpus = Seq(
      (1L, s"prefix alpha $shared suffix omega"),
      (2L, s"$shared tail piece here"),
      (3L, "aa bb cc dd xx yy aa bb cc dd"),
      (4L, "totally unrelated words that appear exactly once each new time"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(corpus, col("doc_id"), col("text"), k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    // doc 1: positions 2..8 carry the shared 4-grams -> one span [2, 11] = 10 tokens of 14
    assert(got(1L) == ((14, 1, 10, 7142)), got(1L).toString)
    // doc 2: same passage at offset 0 -> span [0, 9] = 10 tokens of 13
    assert(got(2L) == ((13, 1, 10, 7692)), got(2L).toString)
    // doc 3: intra-doc repeat "aa bb cc dd" at 0 and 6 -> two spans (gap 1..5 unmarked... positions 0 and 6, break since 6 > 0+4)
    assert(got(3L)._2 == 2 && got(3L)._3 == 8, got(3L).toString)
    assert(got(4L) == ((10, 0, 0, 0)))
    assert(got(5L) == ((2, 0, 0, 0)))
  }

  test("duplicateSpans merges adjacent gram positions from one long shared passage") {
    import spark.implicits._
    // the whole 12-token doc is duplicated -> every position marked, ONE span
    val text = "p q r s t u v w x y z zz"
    val corpus = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(corpus, col("doc_id"), col("text"), k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.toSet == Set((1L, 12, 1, 12, 10000), (2L, 12, 1, 12, 10000)))
  }
}
