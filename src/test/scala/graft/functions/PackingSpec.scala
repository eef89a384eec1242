package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // shard a: 3 + 2 + 4 tokens, L=4 → windows 0, 0-1, 1-2
    (0L, "a", "t1 t2 t3"),
    (1L, "a", "t4 t5"),
    (2L, "a", "t6 t7 t8 t9"),
    // shard b: empty doc then a 5-token doc spanning two windows
    (10L, "b", "   "),
    (11L, "b", "u1 u2 u3 u4 u5")
  ).toDF("doc_id", "shard", "text")

  test("packSequences assigns per-shard offsets and window ranges") {
    val out = Packing.packSequences(docs, col("doc_id"), col("text"), col("shard"), 4)
      .orderBy("shard", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, "a", 3, 0L, 0L, 0L),
      (1L, "a", 2, 3L, 0L, 1L),   // spans the window boundary
      (2L, "a", 4, 5L, 1L, 2L),
      (10L, "b", 0, 0L, 0L, 0L),  // zero-token doc occupies its start window
      (11L, "b", 5, 0L, 0L, 1L)))
  }

  test("chunkWindows covers every token with the configured overlap") {
    val df = Seq(
      (0L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 toks → 2 chunks
      (1L, "a b c"),                                   // under chunkLen → 1 chunk
      (2L, " \t ")                                     // no tokens → no chunks
    ).toDF("doc_id", "text")
    val out = Packing.chunkWindows(df, col("doc_id"), col("text"), chunkLen = 64, stride = 48)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(out == Seq((0L, 0, 0, 64), (0L, 1, 48, 100), (1L, 0, 0, 3)))
    // coverage: chunk 1 starts at 48 < 64 (overlap) and ends at n
  }

  test("chunkWindows rejects a stride above the chunk length") {
    intercept[IllegalArgumentException] {
      Packing.chunkWindows(Seq((0L, "x")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunkLen = 8, stride = 9)
    }
  }

  test("token stream is conserved: next offset = previous offset + length") {
    val big = (0 until 200).map(i => (i.toLong, s"s${i % 3}",
      (0 to i % 7).map(j => s"w$j").mkString(" "))).toDF("doc_id", "shard", "text")
    // conservation per shard: max(tok_start + n_tokens) == sum(n_tokens)
    val ok = Packing.packSequences(big, col("doc_id"), col("text"), col("shard"), 16)
      .groupBy("shard")
      .agg(max(col("tok_start") + col("n_tokens")).as("end"),
        sum(col("n_tokens")).as("total"))
      .filter(col("end") =!= col("total"))
    assert(ok.isEmpty, "per-shard token stream must have no gaps or overlaps")
  }

  test("cdcChunks: chunks tile the document exactly") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(5)
    val texts = (0L until 20L).map(i =>
      (i, (0 until 300 + rng.nextInt(200)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString))
    val df = texts.toDF("doc_id", "text")
    val chunks = Packing.cdcChunks(df, col("doc_id"), col("text"), k = 8, divisor = 32)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    texts.foreach { case (id, text) =>
      val cs = byDoc(id).sortBy(_.getInt(1))
      // contiguous 1-based tiling: starts chain and lengths sum to |text|
      assert(cs.head.getInt(2) == 1)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b.getInt(2) == a.getInt(2) + a.getInt(3))
        case _ => ()
      }
      assert(cs.map(_.getInt(3)).sum == text.length)
    }
  }

  test("CdcCuts equals the md5 array-expression formulation, incl. non-BMP text") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(13)
    val texts = Seq(
      (1L, (0 until 500).map(_ => ('a' + rng.nextInt(26)).toChar).mkString),
      (2L, "héllo wörld " * 40),          // non-ASCII BMP
      (3L, "ab😀cd " * 60),      // supplementary codepoint (emoji)
      (4L, "tiny"))                        // shorter than k
    val df = texts.toDF("doc_id", "text")
    val k = 8; val divisor = 16
    val fast = graft.functions.expressions.CdcCuts.cutsCol(col("text"), k, divisor)
    // the reference formulation the DuckDB oracle mirrors
    val ends = when(length(col("text")) - 1 >= k,
      sequence(lit(k), length(col("text")).cast("int") - 1)).otherwise(array().cast("array<int>"))
    val bounds = filter(ends, p =>
      conv(substring(md5(col("text").substr(p - (k - 1), lit(k))), 1, 7), 16, 10)
        .cast("long") % divisor === 0)
    val slow = concat(array(lit(1)), transform(bounds, b => b + 1),
      array(length(col("text")).cast("int") + 1))
    val rows = df.select(col("doc_id"), fast.as("f"), slow.as("s")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"doc ${r.getLong(0)}")
    }
    // and at least one non-trivial boundary actually fired
    assert(rows.exists(_.getSeq[Int](1).size > 2))
  }

  test("cdcChunks: boundaries survive a front insertion (fixed windows do not)") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(7)
    val base = (0 until 2000).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val edited = "INSERTED PREFIX >> " + base
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val fps = Packing.cdcChunks(df, col("doc_id"), col("text"), k = 8, divisor = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(4)).toSet }
    val shared = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).size
    assert(shared >= 0.8,
      s"CDC should preserve most chunks across a front insertion, shared=$shared")
  }
}
