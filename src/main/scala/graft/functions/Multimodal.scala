package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The real decoders (JPEG/PNG, PCM, video frames) are NOT available in
  * this environment — the `decode*` steps below are clearly-marked
  * deterministic fakes — but the Spark-side machinery is real and tested:
  * schema, batch iteration via `mapPartitions` (the JVM analogue of
  * `mapInPandas`: one buffer-reuse loop per partition, not one call per
  * row), partition sizing, and the downstream feature columns.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte], meta_width: Int, meta_height: Int)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 width: Int, height: Int, checksum: Long, brightness: Double)

  /** Deterministic fake corpus: binary payloads derived from the id so
    * tests are reproducible without media libraries.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i
      val len = 64 + (id % 64).toInt
      val bytes = Array.tabulate(len)(j => ((id * 31 + j * 7) % 256).toByte)
      MediaRow(id, if (id % 2 == 0) "image" else "audio", bytes, 4 + (id % 16).toInt, 4 + (id % 8).toInt)
    }
  }

  /** What a decoder recovers from one payload: pixel (or sample)
    * dimensions and a brightness statistic on the 0–255 scale.
    */
  final case class DecodedMedia(width: Int, height: Int, brightness: Double)

  /** The init-once decoder contract: the OUTER thunk runs once per
    * partition (native context, codec tables, scratch buffers); the
    * inner function runs per row in the partition's tight loop. This is
    * the seam a real codec plugs into — the operator, schema, and
    * batching do not change (MultimodalSpec proves it by running a real
    * `javax.imageio` PNG/JPEG decoder through the same path the oracle
    * queries run the stub through).
    */
  type DecoderInit = () => MediaRow => DecodedMedia

  /** STUB decoder — deterministic fake for oracle-checked queries:
    * "brightness" is the mean raw byte value, dimensions echo the
    * metadata. SQL-replayable, needs no codec.
    */
  val stubDecoder: DecoderInit = () => { r =>
    val bytes = r.content
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    DecodedMedia(r.meta_width, r.meta_height,
      math.round(sum.toDouble / math.max(bytes.length, 1) * 10000d) / 10000d)
  }

  /** REAL image decoder on the JDK's built-in `javax.imageio` (PNG,
    * JPEG, BMP, GIF — part of `java.desktop`, headless-safe): true
    * pixel dimensions and mean gray level (mean over pixels of
    * (r+g+b)/3, rounded to 4 dp — the same 0–255 scale as the stub).
    * Init-once disables ImageIO's temp-file cache (per-partition, not
    * per-row); decode failures surface as a loud exception with the
    * media id, never a silent wrong row.
    */
  val imageIoDecoder: DecoderInit = () => {
    javax.imageio.ImageIO.setUseCache(false) // once per partition
    r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      if (img == null)
        throw new IllegalArgumentException(
          s"media_id=${r.media_id}: payload is not a decodable image")
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      val n = math.max(img.getWidth.toLong * img.getHeight, 1L)
      DecodedMedia(img.getWidth, img.getHeight,
        math.round(sum.toDouble / (3L * n) * 10000d) / 10000d)
  }

  /** Decode + feature extraction with a pluggable [[DecoderInit]]:
    * raw-byte features (length, CRC) come from the operator, decoded
    * features (dimensions, brightness) from the decoder. Default is the
    * [[stubDecoder]] (the oracle-checked deterministic fake); swap in
    * [[imageIoDecoder]] — or a native codec — without touching the
    * operator.
    */
  def extractFeatures(media: Dataset[MediaRow],
                      decoder: DecoderInit = stubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decode = decoder() // per-partition init, once
      rows.map { r =>
        val bytes = r.content
        val d = decode(r)
        val crc = new java.util.zip.CRC32()
        crc.update(bytes)
        MediaFeatures(r.media_id, r.kind, bytes.length, d.width, d.height,
          crc.getValue, d.brightness)
      }
    }
  }

  final case class MediaThumb(media_id: Long, kind: String, thumb_len: Int, thumb_sum: Long)

  /** STUB resize — the byte-producing counterpart of [[resizePlan]]:
    * downsample each payload to `samples` evenly-strided bytes (a real
    * implementation swaps the sampling loop for an image scaler; the
    * per-partition batch contract — init once, tight loop, no per-row
    * closure — is the part that carries to a real codec). The thumb
    * summary (`thumb_len`, exact integer `thumb_sum`) is deterministic
    * from the id-derived payload, so the oracle replays it in SQL.
    */
  def resizeThumbnails(media: Dataset[MediaRow], samples: Int = 16): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real decoder/scaler would init its native context here, once
      rows.map { r =>
        val len = r.content.length
        val stride = math.max(len / samples, 1)
        var j = 0
        var sum = 0L
        var cnt = 0
        while (j < samples && j * stride < len) {
          sum += (r.content(j * stride) & 0xff)
          cnt += 1
          j += 1
        }
        MediaThumb(r.media_id, r.kind, cnt, sum)
      }
    }
  }

  /** "Resize" plumbing: recompute metadata and re-partition by target
    * bucket so downstream GPU-ish batch stages get even partitions.
    */
  def resizePlan(features: DataFrame, targetWidth: Int, shufflePartitions: Int): DataFrame =
    features
      .withColumn("scale", round(lit(targetWidth).cast("double") / greatest(col("width"), lit(1)), 4))
      .withColumn("out_width", lit(targetWidth))
      .withColumn("out_height", greatest(round(col("height") * col("scale")).cast("int"), lit(1)))
      .repartition(shufflePartitions, col("kind"), col("media_id"))

  /** Frame-sampling plan for video-like rows: explode a deterministic
    * frame index sequence (every `stride`-th frame of `n_frames`).
    */
  def frameSamplePlan(media: DataFrame, nFrames: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0), lit(nFrames - 1), lit(stride))).as("frame_idx"))

  /** Perceptual hash (aHash family) of an opaque media `binary` column as
    * `bands` packed band integers — see
    * [[graft.functions.expressions.PHashBands]] for the per-row pipeline
    * (stub decode → 64-sample resize → mean threshold → band packing).
    */
  def pHashBands(content: Column, bands: Int = 8, bitsPerBand: Int = 16): Column =
    graft.functions.expressions.PHash.pHashBandsCol(content, bands, bitsPerBand)

  /** Voice-activity trim stats over an opaque PCM `binary` column — see
    * [[graft.functions.expressions.AudioTrimStats]]: per row, frame
    * count, active-frame count, and first/last active frame (−1/−1 when
    * all-silent). Map-side only at any scale.
    */
  def audioTrimStats(content: Column, frameLen: Int = 32, threshold: Long = 60000L): Column =
    graft.functions.expressions.Media.audioTrimStatsCol(content, frameLen, threshold)

  /** Scene-cut frame indices over an opaque video `binary` column — see
    * [[graft.functions.expressions.SceneCuts]]: integer-exact mean-luma
    * delta over consecutive complete frames. Map-side only at any scale.
    */
  def sceneCuts(content: Column, frameLen: Int = 32, meanDelta: Int = 6): Column =
    graft.functions.expressions.Media.sceneCutsCol(content, frameLen, meanDelta)

  /** Shot-boundary frame sampling over an opaque video `binary` column:
    * [[sceneCuts]] boundaries split the complete-frame range into shots
    * `[start, end)`, and each shot contributes its middle frame as the
    * representative — `(doc_id, shot_idx, start_frame, end_frame,
    * rep_frame, byte_off, byte_len)`, with `byte_off/byte_len` the slice
    * a downstream decoder would fetch. One codegen pass for the cuts plus
    * one per-doc window — no shuffle beyond the per-doc partition; the
    * frame-sampling step of a video curation pipeline (select k frames
    * per shot, not per fixed stride, so long static shots don't flood
    * the sample).
    */
  def frameSamples(df: DataFrame, id: Column, content: Column,
                   frameLen: Int = 32, meanDelta: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged = df.select(id.as("doc_id"),
        sceneCuts(content, frameLen, meanDelta).as("cuts"),
        (length(content) / frameLen).cast("int").as("nf"))
      .filter(col("nf") >= 1)
    val bounds = staged.select(col("doc_id"), col("nf"),
      explode(concat(array(lit(0)), col("cuts"), array(col("nf")))).as("b"))
    val byDoc = Window.partitionBy("doc_id").orderBy("b")
    bounds
      .withColumn("e", lead(col("b"), 1).over(byDoc))
      .filter(col("e").isNotNull)
      .withColumn("shot_idx", row_number().over(byDoc) - 1)
      .select(col("doc_id"), col("shot_idx"),
        col("b").as("start_frame"), col("e").as("end_frame"),
        ((col("b") + col("e") - 1) / 2).cast("int").as("rep_frame"),
        (((col("b") + col("e") - 1) / 2).cast("int") * frameLen).as("byte_off"),
        lit(frameLen).as("byte_len"))
  }

  /** Image near-duplicate pairs by perceptual hash, blocked with
    * multi-index hashing (Norouzi et al.): a pair within hamming distance
    * `maxDist` must share at least one of `bands` exact band values when
    * `maxDist < bands`, so the band-equality self-join is an EXACT
    * candidate generator — the hamming analogue of MinHash-LSH banding
    * (p22), and the only join shape that survives a billion-image corpus
    * (shuffle on compact `(band_idx, band_val)` keys; candidate volume is
    * governed by band-value entropy, never forced to all-pairs).
    * Output: `(id_a, id_b, dist)` with `dist` the exact
    * `bands*bitsPerBand`-bit hamming distance, verified via per-band XOR
    * popcount on the candidates only.
    *
    * Default geometry: 128-bit code, 8 bands × 16 bits. The band width
    * IS the candidate-volume dial — at 8-bit bands (256 values) the r14
    * sf4.0 sweep measured 13.9× cost growth at 4× data because random
    * band collisions grow as (n/256)² per band; 16-bit bands (65 536
    * values) cut per-band collision mass ~256× while the pigeonhole
    * exactness guarantee (maxDist < bands) is untouched.
    */
  def pHashNearDups(media: DataFrame, id: Column, content: Column,
                    maxDist: Int = 7, bands: Int = 8, bitsPerBand: Int = 16): DataFrame = {
    require(maxDist < bands,
      s"exactness requires maxDist < bands (pigeonhole): $maxDist >= $bands")
    // per-payload hashing is the heavy narrow stage here — same
    // narrow-scan hazard as Dedup's tokenize/gram stages (a small-file
    // media manifest scans as a handful of partitions and serializes the
    // hash work); the shared guard round-robins only when the scan is
    // actually narrow
    val hashed = Dedup.spread(media.toDF()).select(id.as("media_id"),
      pHashBands(content, bands, bitsPerBand).as("bands"))
    val e = hashed.select(col("media_id"), col("bands"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val dist = (0 until bands).map { i =>
      bit_count(element_at(col("ea.bands"), i + 1)
        .bitwiseXOR(element_at(col("eb.bands"), i + 1)))
    }.reduce(_ + _)
    // Hamming distance verifies INLINE on the generated pairs, so only
    // surviving near-dup pairs reach the distinct's shuffle (the same
    // verify-before-shuffle decision as Dedup.embeddingNearDupsLsh,
    // sf1.0-measured in BENCH_NOTES round 9: the earlier
    // distinct-then-verify shape shuffled every candidate pair WITH both
    // 8-element band arrays). A pair colliding in k bands re-verifies k
    // times — bounded by `bands`, pure codegen bit arithmetic; dist is
    // deterministic per pair so the post-filter distinct dedups exactly
    // the same pair set.
    // r16: the band self-join is replaced by Dedup.bucketPairs — one
    // Exchange of the band-exploded rows instead of two, no SMJ sorts,
    // and no join left for the p118 static-mis-broadcast class (the r15
    // merge pin's reason to exist); per-band 16-bit buckets keep
    // collision mass — and so the per-bucket entry array — bounded
    // (SCALE.md r15: 65k bucket values, sublinear measured growth).
    Dedup.bucketPairs(e.select(col("band_idx"), col("band_val"),
        struct(col("media_id").as("id"), col("bands")).as("e")),
        Seq("band_idx", "band_val"), col("e"))
      .select(col("ea.id").as("id_a"), col("eb.id").as("id_b"), dist.cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }
}
