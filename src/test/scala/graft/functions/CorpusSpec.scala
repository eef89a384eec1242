package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureWeights: shares sum to ~1 and weights invert the share") {
    val docs = Seq(
      (0L, "a", "one two three four five six"),   // 6 tokens
      (1L, "a", "seven eight"),                   // 2 tokens → a: 8
      (2L, "b", "nine ten"),                      // b: 2
      (3L, "c", "eleven twelve thirteen fourteen fifteen sixteen")) // c: 6
      .toDF("doc_id", "source", "text")
    val rows = Corpus.mixtureWeights(docs, col("source"), col("text"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(rows.map(_._3).toSeq == Seq(8L, 2L, 6L))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-6)
    // uniform weight = (1/3) / share: undersampled strata get weight > 1
    val bySrc = rows.map(r => r._1 -> r._5).toMap
    assert(bySrc("b") > 1.0 && bySrc("a") < 1.0)
    assert(math.abs(bySrc("a") - (1.0 / 3) / 0.5) < 1e-4)
  }

  test("topNgrams: counts, case folding, tie-break on the gram, short docs") {
    val docs = Seq(
      (0L, "big Data big data"),   // "big data"×2 (case-folded), "data big"×1
      (1L, "big data rules"),
      (2L, "solo"),                // 1 token → no bigrams
      (3L, "")                     // empty → nothing
    ).toDF("doc_id", "text")
    val rows = Corpus.topNgrams(docs, col("text"), n = 2, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("big data", 3L), ("data big", 1L), ("data rules", 1L)))
    val uni = Corpus.topNgrams(docs, col("text"), n = 1, topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(uni == Seq(("big", 3L), ("data", 3L))) // tie broken by gram asc
  }

  test("lmScore: hand-computed add-one bigram NLL, unseen-bigram and unseen-context backoff") {
    val docs = Seq(
      (1L, true, "a b a b"),   // reference: uni a→2 b→2, V=2; bg (a,b)→2 (b,a)→1
      (2L, false, "a b c"),    // (a,b) seen; (b,c) unseen bigram, known ctx b
      (3L, false, "z q"),      // (z,q): unknown context → vocabulary floor
      (4L, false, "solo"),     // <2 tokens → no bigrams → dropped
      (5L, false, "")
    ).toDF("doc_id", "is_ref", "text")
    val rows = Corpus.lmScore(docs, col("doc_id"), col("text"), col("is_ref"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // micros: lp(a,b)=round(ln(3/4)·1e6)=-287682, lp(b,a)=round(ln(2/4)·1e6)=-693147,
    // unk(ctx known)=round(ln(1/4)·1e6)=-1386294, floor=round(ln(1/2)·1e6)=-693147
    val expected = Seq(
      (1L, 3, 0.4228),  // (2·-287682 + -693147)/1e6 / 3 negated
      (2L, 2, 0.837),   // (-287682 + -1386294)/1e6 / 2 negated
      (3L, 1, 0.6931))  // floor/1e6 negated
    assert(rows.toSeq == expected, rows.toSeq)
    // shuffle-join fallback computes the identical scores
    val plain = Corpus.lmScore(docs, col("doc_id"), col("text"), col("is_ref"),
        broadcastLm = false)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(plain.toSeq == expected)
  }

  test("temperatureMixture: alpha=1 recovers shares; alpha<1 compresses the head") {
    val docs = Seq(
      (1L, "a", "w w w w w w w w w"),  // 9 tokens
      (2L, "b", "w w w"),              // 3
      (3L, "c", "")                    // 0 → q = 0
    ).toDF("doc_id", "src", "text")
    def q(alpha: Double) = Corpus.temperatureMixture(docs, col("src"), col("text"), alpha)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val q1 = q(1.0)
    assert(q1("a") == 0.75 && q1("b") == 0.25 && q1("c") == 0.0, q1.toString)
    val q3 = q(0.3)
    // flattening: the head loses mass, the tail gains, zero stays zero
    assert(q3("a") < 0.75 && q3("b") > 0.25 && q3("c") == 0.0, q3.toString)
    assert(math.abs(q3.values.sum - 1.0) < 1e-5)
  }

  test("bpePairCounts: word-frequency-weighted char pairs; 1-char words drop") {
    val docs = Seq(
      (1L, "abab ab"),  // abab: ab,ba,ab; ab: ab
      (2L, "ab a"),     // ab: ab; a: no pairs
      (3L, "")
    ).toDF("doc_id", "text")
    val pairs = Corpus.bpePairCounts(docs, col("text"), topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // word freqs: abab→1, ab→2, a→1 ⇒ "ab": 2·1(from abab) + 1·2(from ab) = 4
    assert(pairs == Seq(("ab", 4L), ("ba", 1L)))
  }

  test("collocations: lift surfaces the bound pair over the frequent one") {
    // "san francisco" always co-occurs (5/5); "the cat" co-occurs 5
    // times but both words are everywhere — lift must rank the bound
    // pair far above the frequent one, exact integers
    val docs = (1L to 5L).map(i =>
      (i, "the cat sat on the mat near san francisco bay the end"))
      .toDF("doc_id", "text")
    val rows = Corpus.collocations(docs, col("text"), minJoint = 5L, topN = 50)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(5)))).toMap
    val n = 5L * 12L
    assert(rows(("san", "francisco")) == ((5L, 5L * n * 1000L / (5L * 5L))))
    assert(rows(("the", "cat")) == ((5L, 5L * n * 1000L / (15L * 5L))))
    assert(rows(("san", "francisco"))._2 > rows(("the", "cat"))._2)
    // the count floor: every pair here appears exactly 5 times, so a
    // floor of 6 empties the table
    assert(Corpus.collocations(docs, col("text"), minJoint = 6L, topN = 10)
      .count() == 0L)
  }

  test("bpeTrainRounds: argmax merge per round, greedy-leftmost apply, weighted counts") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    // vocab: aaab freq 2, ab freq 1
    // r1: aa=4 ab=3 → merge (a,a); aaab→[aa,a,b] (greedy leftmost), n=3·2+2·1=8
    // r2: (a,b)=3 (aa,a)=2 → merge (a,b); aaab→[aa,ab], ab→[ab], n=2·2+1=5
    // r3: (aa,ab)=2 → merge; n=1·2+1=3
    val rows = Corpus.bpeTrainRounds(docs, col("text"), rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "a", "a", 4L, 8L),
      (2, "a", "b", 3L, 5L),
      (3, "aa", "ab", 2L, 3L)))
  }

  test("bpeTrainRounds: overlapping run takes odd ranks (sequential semantics)") {
    // "aaaa": (a,a) matches at pos 0,1,2 = one island; greedy leftmost keeps
    // ranks 1 and 3 → [aa][aa], NOT [aa][a][a]
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r1 = Corpus.bpeTrainRounds(docs, col("text"), rounds = 1).head()
    assert((r1.getString(1), r1.getString(2), r1.getLong(3), r1.getLong(4)) ==
      ("a", "a", 3L, 2L))
  }

  test("bpeTrainRounds: merge-table exhaustion emits fixpoint rows, not an exception") {
    // "a b a": single-character words only — no adjacent pair EVER exists,
    // so every round is a no-op fixpoint row (the MIS/k-core convention)
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val rows = Corpus.bpeTrainRounds(docs, col("text"), rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq((1, "", "", 0L, 3L), (2, "", "", 0L, 3L)))
    // exhaustion mid-run: "ab ab" fully merges in round 1, round 2 is a no-op
    val docs2 = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val rows2 = Corpus.bpeTrainRounds(docs2, col("text"), rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows2.toSeq == Seq((1, "a", "b", 2L, 2L), (2, "", "", 0L, 2L)))
  }

  test("bm25Chunks surfaces the relevant passage a whole-doc ranking buries") {
    import spark.implicits._
    // doc 1: long noise with ONE query-dense chunk near the end; doc 2:
    // short and mildly relevant. Whole-doc BM25 length-normalizes doc 1
    // down; chunk BM25 must rank doc 1's hot chunk first.
    val noise = Seq.fill(3)((1 to 32).map(i => s"w$i").mkString(" ")).mkString(" ")
    val hot = "needle " * 10 + ("x " * 22).trim
    val docs = Seq(
      (1L, s"$noise $hot"),
      (2L, "needle plus other words " + ("y " * 10).trim)).toDF("doc_id", "text")
    val chunks = Corpus.bm25Chunks(docs, col("doc_id"), col("text"),
      terms = Seq("needle"), chunkLen = 32, stride = 32, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // doc 1 = 96 noise tokens (chunks 0-2) + the 32-token hot chunk (id 3):
    // retrieval must pinpoint WHICH window is relevant, not just the doc
    assert(chunks.head._1 == 1L && chunks.head._2 == 3,
      s"hot chunk of doc 1 must rank first: ${chunks.toSeq}")
    // noise chunks score 0 and are dropped; doc 2's single chunk follows
    assert(chunks.map(c => (c._1, c._2)).toSet == Set((1L, 3), (2L, 0)), chunks.toSeq)
    assert(chunks.head._3 > chunks.last._3)
  }

  test("skipGramPairs matches the naive windowed cross-count and respects doc bounds") {
    val docs = Seq((1L, "a b c a"), (2L, "c d")).toDF("doc_id", "text")
    val got = Corpus.skipGramPairs(docs, col("doc_id"), col("text"),
        window = 2, topK = 100)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // naive reference over both docs
    val want = Seq("a b c a".split(' ').toSeq, "c d".split(' ').toSeq)
      .flatMap { ts =>
        for {
          i <- ts.indices; j <- ts.indices
          if i != j && math.abs(i - j) <= 2
        } yield (ts(i), ts(j))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
    // pairs never cross a document boundary: doc 1 ends "c a", doc 2
    // starts "c d" — (a, d) must not exist
    assert(!got.contains(("a", "d")))
    // symmetric window → symmetric counts
    assert(got(("a", "b")) == got(("b", "a")))
  }

  test("vocab coverage boundary math: hand-built Zipf resolves exactly") {
    // corpus: a×10 b×5 c×3 d×1 e×1 (20 tokens, 5 types).
    // 500‰→10 tokens: 1 type. 900‰→18: 3 types. 950‰→19: 4 types
    // (boundary inside the freq-1 class). 990‰→20: all 5 types.
    val text = ("a " * 10) + ("b " * 5) + ("c " * 3) + "d e"
    val docs = Seq((1L, text.trim)).toDF("doc_id", "text")
    // replicate the registered query's frequency-of-frequency walk
    val toks = docs.select(explode(TextOps.tokens(lower(col("text")))).as("t"))
    val ff = toks.groupBy("t").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).as("n_types"))
    import org.apache.spark.sql.expressions.Window
    val prev = Window.orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = ff.select(col("freq"), col("n_types"),
      coalesce(sum(col("n_types")).over(prev), lit(0L)).as("types_before"),
      coalesce(sum(col("freq") * col("n_types")).over(prev), lit(0L)).as("tokens_before"),
      sum(col("freq") * col("n_types")).over(Window.partitionBy()).as("n_total"))
    val got = Seq(500, 900, 950, 990).toDF("coverage_permille")
      .crossJoin(cum)
      .withColumn("target_tokens", expr("(coverage_permille * n_total + 999L) div 1000L"))
      .filter(col("tokens_before") + col("freq") * col("n_types") >= col("target_tokens"))
      .groupBy("coverage_permille", "target_tokens")
      .agg(min(struct(col("types_before"), col("freq"), col("tokens_before"))).as("b"))
      .select(col("coverage_permille"),
        expr("b.types_before + (target_tokens - b.tokens_before + b.freq - 1L) div b.freq")
          .as("types"))
      .orderBy("coverage_permille").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((500, 1L), (900, 3L), (950, 4L), (990, 5L)))
  }

  test("negativeSamplingTable: count^0.75 smoothing, exact integer ppm, guarded range") {
    val docs = Seq((1L, ("the " * 81).trim + " rare " + ("word " * 16).trim))
      .toDF("doc_id", "text")
    val out = Corpus.negativeSamplingTable(docs, col("text"), topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byTok = out.map(t => t._1 -> t).toMap
    // weights are floor(n^0.75 * 1000) computed via the sqrt(sqrt(n^3))
    // identity — check against Math.pow (equal here; the identity's
    // point is cross-ENGINE bit-stability, not a different value)
    assert(byTok("the")._3 == math.floor(math.pow(81, 0.75) * 1000).toLong)   // 27000
    assert(byTok("word")._3 == math.floor(math.pow(16, 0.75) * 1000).toLong)  // 8000
    assert(byTok("rare")._3 == 1000L)
    // smoothing: 'the' is 81x more frequent than 'rare' but only 27x
    // the sampling mass — the stopword down-weighting that motivates ^0.75
    assert(byTok("the")._2 / byTok("rare")._2 == 81L)
    assert(byTok("the")._3 / byTok("rare")._3 == 27L)
    // ppm is exact integer division against the exact long total
    val total = out.map(_._3).sum
    out.foreach { case (_, _, w, ppm) => assert(ppm == w * 1000000L / total) }
  }

  test("negativeSamplingTable wide counts: exact integer fourth root past the double range") {
    // defining property of floor(1000*n^0.75) = floor((n^3*10^12)^(1/4)):
    // r^4 <= n^3*10^12 < (r+1)^4 — exact, no float anywhere. Covers the
    // r14 sf4.0 live value (364480), the boundary, and billion-scale
    // counts a 100 TB corpus actually has.
    for (n <- Seq(0L, 1L, 16L, 208063L, 208064L, 364480L, 1000000007L, 123456789012L)) {
      val r = BigInt(Corpus.milliWExact(n))
      val target = BigInt(n) * n * n * BigInt(10).pow(12)
      assert(r.pow(4) <= target && (r + 1).pow(4) > target, s"n=$n r=$r")
    }
    // regression: the old hand-rolled Newton loop (prev != r termination)
    // 2-cycled forever on arguments of the form a^2-1 and seeded from a
    // double that overflows to Infinity for n near 2^63. BigInteger.sqrt
    // must terminate and stay exact across a dense sweep and at the top
    // of the long range (n^3*10^12 ~ 2^229, far past double).
    for (n <- (0L to 5000L) ++ Seq(Long.MaxValue, Long.MaxValue - 1, (1L << 62) - 1)) {
      val r = BigInt(Corpus.milliWExact(n))
      val target = BigInt(n) * n * n * BigInt(10).pow(12)
      assert(r.pow(4) <= target && (r + 1).pow(4) > target, s"n=$n r=$r")
    }
    // perfect fourth powers land exactly: 16^0.75 = 8
    assert(Corpus.milliWExact(16L) == 8000L)
    // monotone across the regime boundary (the double path serves
    // n <= 208063 in the query; values must not invert at the seam)
    assert(Corpus.milliWExact(208064L) >=
      math.floor(math.sqrt(math.sqrt(208063.0 * 208063 * 208063)) * 1000).toLong)
    // end-to-end: a token count past the old raise_error guard now
    // yields a row instead of an error
    import org.apache.spark.sql.functions._
    val big = spark.range(1).select(lit(1L).as("doc_id"),
      concat_ws(" ", array_repeat(lit("tok"), 208100)).as("text"))
    val row = Corpus.negativeSamplingTable(big, col("text"), topK = 1).collect()(0)
    assert(row.getLong(1) == 208100L && row.getLong(2) == Corpus.milliWExact(208100L))
  }

  test("packContext keeps the score-order prefix that fits the budget (take-while)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // scores 9 > 8 > 7 > 6; lengths 100, 120, 50, 10 — budget 250 keeps
    // the first two (220) but NOT the third (270 > 250), and take-while
    // semantics must also exclude the fourth even though 220+10 fits
    val hits = Seq((1L, 9.0, 100), (2L, 8.0, 120), (3L, 7.0, 50), (4L, 6.0, 10))
      .toDF("id", "score", "len")
    val got = Corpus.packContext(hits, col("score"), Seq(col("id")), col("len"), 250)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((1L, 100L), (2L, 220L)))
  }

  test("packContext breaks score ties by id and validates the budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hits = Seq((5L, 1.0, 10), (3L, 1.0, 10), (4L, 1.0, 10))
      .toDF("id", "score", "len")
    val got = Corpus.packContext(hits, col("score"), Seq(col("id")), col("len"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((3L, 10L), (4L, 20L)))
    intercept[IllegalArgumentException] {
      Corpus.packContext(hits, col("score"), Seq(col("id")), col("len"), 0)
    }
  }

  test("sequencePacking matches a sequential concat-and-chunk reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // ids 0..99, token lengths 1..40 cycling, plus empty docs (t=0) that
    // must be dropped; one shard so the whole order is the md5 shuffle
    val docs = (0L until 100L).map(i => (i, (i % 41).toInt)).toDF("id", "t")
    val got = Corpus.sequencePacking(docs, col("id"), col("t"),
        seqLen = 64, shards = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // sequential reference: md5-sorted docs, running offset, cut at 64
    val ordered = (0L until 100L).map(i => (i, (i % 41).toLong))
      .filter(_._2 > 0).sortBy { case (i, _) => (md5hex(s"pack:$i"), i) }
    var off = 0L; var crossers = 0L
    ordered.foreach { case (_, t) =>
      if ((off + t - 1) / 64 > off / 64) crossers += 1
      off += t
    }
    assert(got === Seq((0, ordered.size.toLong, off,
      (off + 63) / 64, crossers, off % 64)))
  }

  test("lengthBuckets: band edges, padded cost, and waste arithmetic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // lengths straddling the 16/32 edges: bucket 0 = {5, 15}, bucket 1
    // = {16, 31}, bucket 2 = {32}; padded = n·max per bucket
    val docs = Seq((1L, 5), (2L, 15), (3L, 16), (4L, 31), (5L, 32))
      .toDF("id", "t")
    val got = Corpus.lengthBuckets(docs, col("id"), col("t"))
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // global: 5 docs × max 32 = 160 padded over 99 tokens →
    // waste = round(61e6/160) = 381250
    assert(got === Seq(
      (0, 2L, 20L, 15L, 30L, 333333L, 160L, 381250L),
      (1, 2L, 47L, 31L, 62L, 241935L, 160L, 381250L),
      (2, 1L, 32L, 32L, 32L, 0L, 160L, 381250L)))
    // bucketing can only reduce padded cost
    assert(got.map(_._5).sum <= got.head._7)
  }

  test("spanCorruption matches a sequential mask reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def seed(id: Long, p: Int): Boolean =
      java.lang.Long.parseLong(md5hex(s"span:$id:$p").take(7), 16) < (1L << 25)
    val docs = (0L until 60L).map(i => (i, (i % 23).toInt)).toDF("id", "t")
    val got = Corpus.spanCorruption(docs, col("id"), col("t"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val want = (0L until 60L).map { i =>
      val n = (i % 23).toInt
      val seeds = (0 until n).filter(p => seed(i, p))
      val corrupted = seeds.flatMap(p => p to math.min(p + 2, n - 1)).distinct.sorted
      val spans = corrupted.count(x => !corrupted.contains(x - 1))
      (i, n.toLong, seeds.size.toLong, corrupted.size.toLong, spans.toLong,
        (n - corrupted.size + spans).toLong, (corrupted.size + spans).toLong)
    }
    assert(got === want)
    // invariants: a doc with zero tokens is all zeros + input_len 0;
    // sentinel count never exceeds seeds; target ≤ n + spans
    got.foreach { case (_, n, s, c, sp, in, tg) =>
      assert(sp <= s && c <= n && in + tg === n + 2 * sp)
      if (n == 0L) assert((s, c, sp, in, tg) === ((0L, 0L, 0L, 0L, 0L)))
    }
  }

  test("sequencePacking: sharding conserves mass and is partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L until 500L).map(i => (i, 1 + (i % 17).toInt)).toDF("id", "t")
    val a = Corpus.sequencePacking(docs, col("id"), col("t"), 128, 4)
      .orderBy("shard").collect().map(_.toSeq).toSeq
    assert(a.map(_(2).asInstanceOf[Long]).sum ===
      (0L until 500L).map(i => 1 + (i % 17)).sum)
    assert(a.map(_(1).asInstanceOf[Long]).sum === 500L)
    val b = Corpus.sequencePacking(docs.repartition(13), col("id"), col("t"), 128, 4)
      .orderBy("shard").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
