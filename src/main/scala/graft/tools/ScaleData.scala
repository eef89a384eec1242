package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: tile the driver's sf0.1 testdata into a larger scale factor
  * for scale REHEARSALS (never for correctness — the DuckDB oracle gate
  * only runs on the driver's own sf dirs, which stay read-only and
  * untouched). `runMain graft.tools.ScaleData [srcDir] [dstDir] [tiles]`,
  * default 10 tiles of sf0.1 → `/tmp/graft-sf1.0` (~6 M lineitem rows,
  * i.e. TPC-H sf1-equivalent).
  *
  * Tiling rules (all map-side; the only shuffle is the write-fanout
  * repartition):
  *   - Every key column gets a per-tile offset (`+ tile·10^8` for int64
  *     keys, `+ tile·1000` for the small int32 dimension keys), applied
  *     consistently across fact/dimension tables so FK joins, the derived
  *     property graph, and the event→customer linkage all stay intact
  *     WITHIN a tile and never collide ACROSS tiles — the scaled graph is
  *     10 disconnected copies, which is exactly the shape that measures
  *     whether iterative-algorithm round counts stay flat (component
  *     diameter unchanged) while per-round work grows 10×.
  *   - Name-like columns get a `#<tile>` suffix for tiles > 0 so
  *     name-keyed groupings stay per-tile and tile 0 remains the
  *     original data verbatim.
  *   - `documents.text` gets a trailing ` ⁋<tile>` marker for tiles > 0:
  *     exact-hash dedup no longer collapses cross-tile copies, while
  *     shingle-level near-dup structure DOES link them (every tile copy
  *     is a genuine near-duplicate) — the duplicate-heavy-crawl shape a
  *     production dedup run actually sees.
  *   - `embeddings.embedding` is multiplied by a per-(tile, dim) ±1 sign
  *     pattern (tile 0 = identity). One sign pattern per tile means every
  *     WITHIN-tile dot product and norm is bit-identical to sf0.1 (float
  *     negation is exact), so each tile carries the original near-dup
  *     cluster structure; ACROSS tiles the patterns differ, scrambling
  *     cosines to near zero, so the scaled corpus is ~10 independent
  *     copies of the sf0.1 similarity graph rather than 10× duplicate
  *     mega-clusters.
  *
  * SKEW MODE (`skew` as the 4th arg — r13 verdict ask: every tile is
  * uniform by construction, so salting/AQE-skew paths had never been
  * stress-measured against a genuinely skewed key). Three deterministic
  * hash-driven distortions, each per-tile so tiles stay disconnected:
  *   - HUB VERTICES: 10% of lineitem rows remap `l_partkey` onto 16
  *     per-tile hub parts with a cubic-inverse (zipf-ish) law — hub 0
  *     alone absorbs ~4% of ALL co-purchase edge endpoints, the
  *     "curse of the last reducer" shape for the CC / triangle /
  *     degree-join family. FK integrity holds (hubs are existing low
  *     part keys).
  *   - HUB USERS: 10% of events remap `user_id` onto 8 per-tile hub
  *     customers, same law — one user owns ~4% of the stream, the
  *     mega-session shape for sessionization/window state.
  *   - ZIPF DOC LENGTHS: 4% of documents inflate `text` by a
  *     capped-inverse repeat factor (up to 32×, mean mass ~3×) — the
  *     long-document tail that stresses shingle/MinHash/LSH row
  *     explosion; `n_chars` is recomputed so the metadata contract
  *     holds on the skewed corpus.
  * Correctness on skewed data is still oracle-gated: Verify + check.py
  * run against the written dir like any other data root.
  */
object ScaleData {

  private val Off64 = 100000000L
  private val Off32 = 1000

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft-sf1.0"
    val tiles = if (args.length > 2) args(2).toInt else 10
    val skew = args.length > 3 && args(3) == "skew"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one row per tile, broadcast: each table scans ONCE and fans out
    // map-side through the broadcast nested-loop product
    val tileDf = broadcast(spark.range(tiles).select(col("id").cast("int").as("tile")))

    val k64: Column => Column = c => c + col("tile").cast("long") * Off64
    val k32: Column => Column = c => c + col("tile") * Off32
    val nm: Column => Column = c =>
      when(col("tile") === 0, c).otherwise(concat(c, lit("#"), col("tile")))

    def tileTable(name: String, parts: Int, xf: Map[String, Column => Column]): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val cols = df.columns.toSeq.map(c => xf.getOrElse(c, identity[Column] _)(col(c)).as(c))
      df.crossJoin(tileDf).select(cols: _*)
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] $name -> $dst/$name.parquet (${tiles}x)")
    }

    // zipf-ish hub pick: u ~ hash01 uniform on [0,1); rows below `share`
    // redirect to hub floor(nHubs·(u/share)³) — cubic-inverse mass, hub 0
    // taking ~(1/nHubs)^(1/3) of redirected rows. Hubs are the nHubs
    // LOWEST base keys (testdata keys are 0-contiguous), so FK targets
    // exist; the tile offset is applied AFTER, keeping hubs per-tile.
    def hubRemap(c: Column, idCol: Column, salt: String, share: Double, nHubs: Int): Column = {
      val u = graft.functions.Sampling.hash01(idCol, salt)
      when(u < share,
        floor(pow(u / lit(share), 3.0) * nHubs).cast("long")).otherwise(c)
    }

    tileTable("region", 1, Map("r_regionkey" -> k32, "r_name" -> nm))
    tileTable("nation", 1, Map("n_nationkey" -> k32, "n_name" -> nm, "n_regionkey" -> k32))
    tileTable("customer", 4, Map("c_custkey" -> k64, "c_name" -> nm, "c_nationkey" -> k32))
    tileTable("supplier", 1, Map("s_suppkey" -> k64, "s_name" -> nm, "s_nationkey" -> k32))
    tileTable("part", 2, Map("p_partkey" -> k64, "p_name" -> nm))
    tileTable("orders", 16, Map("o_orderkey" -> k64, "o_custkey" -> k64))
    val liPart: Column => Column =
      if (!skew) k64
      else c => k64(hubRemap(c,
        concat(col("l_orderkey").cast("string"), lit("_"), col("l_linenumber").cast("string")),
        "skewhub:", share = 0.10, nHubs = 16))
    tileTable("lineitem", 32, Map("l_orderkey" -> k64, "l_partkey" -> liPart, "l_suppkey" -> k64))
    val evUser: Column => Column =
      if (!skew) k64
      else c => k64(hubRemap(c, col("event_id"), "skewusr:", share = 0.10, nHubs = 8))
    tileTable("events", 8, Map("event_id" -> k64, "user_id" -> evUser))
    val marker: Column => Column =
      c => when(col("tile") === 0, c).otherwise(concat(c, lit(" ⁋"), col("tile")))
    // capped-inverse repeat factor: 4% of docs get k = min(32, 1/u'),
    // u' uniform — a zipf-ish length tail with ~3× total text mass
    def docText(c: Column): Column =
      if (!skew) marker(c)
      else {
        val u = graft.functions.Sampling.hash01(col("doc_id"), "skewlen:")
        val k = when(u < 0.04,
          least(lit(32),
            (lit(1.0) / greatest(u / lit(0.04), lit(1.0 / 32))).cast("int")))
          .otherwise(lit(1))
        array_join(array_repeat(marker(c), k), "")
      }
    tileTable("documents", 4, Map(
      "doc_id" -> k64,
      "text" -> (docText _),
      // the metadata contract (n_chars == length(text)) must hold on
      // EVERY tiled corpus — the per-tile marker alone changes length
      // on tiles > 0, so recompute unconditionally (docText reduces to
      // marker(c) when skew is off); quality/length operators read it
      "n_chars" -> ((_: Column) => length(docText(col("text"))).cast("long"))))

    // deterministic per-tile sign pattern; tile 0 is the identity so the
    // original data embeds verbatim
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // splitmix64 finalizer over (t, j): a LINEAR expression mod 2 (the
    // first version used `(t*1000003 + j*7919) % 2`) collapses to the
    // parity of t+j, which hands every same-parity tile the IDENTICAL
    // sign vector — cross-tile exact-duplicate embeddings instead of
    // scrambled cosines, silently violating the independent-tiles
    // premise the rehearsal numbers rest on. The mixed form gives each
    // tile an independent pattern (2^-64 collision odds per tile pair),
    // and the assertion makes any future derivation bug loud.
    def sign(t: Int, j: Int): Float = {
      if (t == 0) return 1.0f
      var z = t.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      if ((z & 1L) == 0L) 1.0f else -1.0f
    }
    val signs: Seq[Seq[Float]] = (0 until tiles).map(t => (0 until dim).map(j => sign(t, j)))
    require(signs.distinct.size == tiles,
      "per-tile sign patterns must be pairwise distinct")
    emb.crossJoin(tileDf)
      .select(
        (col("vec_id") + col("tile").cast("long") * Off64).as("vec_id"),
        zip_with(col("embedding"),
          element_at(typedlit(signs), col("tile") + 1),
          (x, s) => x * s).as("embedding"),
        col("label"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[scale] embeddings -> $dst/embeddings.parquet (${tiles}x, sign-rotated)")
    spark.stop()
  }
}
