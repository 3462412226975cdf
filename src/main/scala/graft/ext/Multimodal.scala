package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * Two decode tiers:
  *  - [[decodeImagesReal]] / [[encodeGrayPng]] — a REAL codec path:
  *    PNG encode/decode through `javax.imageio` (in every JRE), run
  *    per-partition so codec setup amortizes across the batch. Gated
  *    end-to-end by the multimodal_decode_real oracle (dimensions and
  *    mean luma recomputed independently in DuckDB).
  *  - [[decodeImages]] — a deliberate deterministic STUB standing in
  *    for the heavyweight codecs (libjpeg/ffmpeg) that are not in this
  *    container; everything Spark-side is real: schemas, batch
  *    iteration via `mapPartitions` (the Scala analog of
  *    `mapInPandas` — per-partition batch processing, no per-row
  *    JVM↔native churn), partition sizing, and metadata pushdown.
  *
  * 100 TB posture: media bytes never shuffle — all derived columns are
  * computed in the scan stage; only compact features/metadata flow into
  * joins and aggregations downstream. `spark.sql.files.maxPartitionBytes`
  * governs batch memory; binary payloads stay off the driver.
  */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)
  ))

  /** Decoded-image feature schema (what a real decoder would emit). */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)
  ))

  // ----------------------------------------------------------------------
  // STUB DECODERS — deterministic fakes. A real deployment swaps these
  // bodies for libjpeg/ffmpeg calls; signatures, batching, and schemas
  // are the production shape.
  // ----------------------------------------------------------------------

  /** STUB: "decode" an image payload. Deterministic fake: dimensions
    * derive from payload length, luma from a byte checksum. */
  private[ext] def stubDecodeImage(id: Long, payload: Array[Byte]): Row = {
    val n = if (payload == null) 0 else payload.length
    val width = 64 + (n % 512)
    val height = 64 + ((n / 7) % 512)
    val channels = 3
    val luma = if (n == 0) 0.0 else {
      var s = 0L; var i = 0
      while (i < n) { s += (payload(i) & 0xFF); i += 1 }
      (s.toDouble / n) / 255.0
    }
    Row(id, width, height, channels, luma)
  }

  /** Decode/feature-extract over media batches. Runs per partition so a
    * real decoder amortizes init (codec contexts) across the batch —
    * the same reason mapInPandas batches rows. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { it =>
        // real impl: init decoder once here
        it.map(r => stubDecodeImage(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }

  // ----------------------------------------------------------------------
  // REAL CODEC PATH — PNG via javax.imageio (present in every JRE).
  // ----------------------------------------------------------------------

  /** Encode `side`×`side` 8-bit grayscale PNGs from raw pixel payloads
    * (`pixelCol`: binary, row-major, exactly side² bytes). A REAL
    * image encoder (javax.imageio), batched per partition so encoder
    * setup amortizes — the production decode shape with the codec
    * direction reversed (it also makes decode verifiable end-to-end:
    * PNG is lossless, so decoded samples must equal the input bytes). */
  def encodeGrayPng(
      df: DataFrame,
      idCol: String = "media_id",
      pixelCol: String = "pixels",
      side: Int = 4
  ): DataFrame = {
    require(side > 0, s"side must be positive, got $side")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("media_id"), col(pixelCol).as("px"))
      .mapPartitions { it =>
        // ImageIO's default stream cache is a TEMP FILE per image —
        // measured ~4× slower than in-memory for tiny payloads
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val id = r.getLong(0)
          val px = r.getAs[Array[Byte]](1)
          require(px != null && px.length >= side * side,
            s"encodeGrayPng: payload for media_id=$id has ${if (px == null) 0 else px.length} bytes, need ${side * side}")
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var i = 0
          while (i < side * side) {
            raster.setSample(i % side, i / side, 0, px(i) & 0xFF)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        }
      }(enc)
  }

  /** REAL image decode via javax.imageio (PNG/JPEG/BMP/GIF — whatever
    * the JRE's ImageIO registry reads): width/height/channel-count from
    * the decoded raster, mean luma over band 0 in [0, 1]. Same schema
    * and batching as the [[decodeImages]] stub — swapping the stub for
    * this is a one-call change. Payloads decode inside the scan
    * partition; bytes never shuffle. */
  def decodeImagesReal(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          require(bytes != null, s"decodeImagesReal: media_id=$id has a NULL payload")
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"decodeImagesReal: media_id=$id is not a decodable image")
          val raster = img.getRaster
          val (w, h, ch) = (img.getWidth, img.getHeight, raster.getNumBands)
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Row(id, w, h, ch, s.toDouble / (w * h) / 255.0)
        }
      }(enc)
  }

  /** REAL image RESIZE: decode (javax.imageio), average-pool
    * `factor`×`factor` blocks of band 0, one row per pooled cell —
    * the downsample step of an image-preprocessing pipeline. Pooled
    * values are integer block sums divided by factor² (exact in
    * double for power-of-two factors, so the oracle needs no
    * rounding). Same per-partition batching as [[decodeImagesReal]];
    * payload bytes never shuffle — only (id, by, bx, pooled) rows. */
  def resizeImagesReal(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("by", IntegerType, nullable = false),
      StructField("bx", IntegerType, nullable = false),
      StructField("pooled", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          require(bytes != null, s"resizeImagesReal: media_id=$id has a NULL payload")
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"resizeImagesReal: media_id=$id is not a decodable image")
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          require(w % factor == 0 && h % factor == 0,
            s"resizeImagesReal: media_id=$id is ${w}x$h, not divisible by $factor")
          for (by <- 0 until h / factor; bx <- 0 until w / factor) yield {
            var s = 0L
            var dy = 0
            while (dy < factor) {
              var dx = 0
              while (dx < factor) {
                s += raster.getSample(bx * factor + dx, by * factor + dy, 0)
                dx += 1
              }
              dy += 1
            }
            Row(id, by, bx, s.toDouble / (factor * factor))
          }
        }
      }(enc)
  }

  /** Average-hash perceptual fingerprint per image (aHash, the
    * classic pHash-family fingerprint): decode via the REAL codec
    * path ([[resizeImagesReal]] at factor 1 = per-pixel samples),
    * threshold each pixel against the image mean, pack the bit map
    * into one long. All-integer arithmetic (pixel sums are exact,
    * /side² of a power-of-two is exact in double), so hashes replay
    * exactly in SQL. Payload bytes never shuffle — only (id, y, x,
    * value) rows feed two keyed aggregations. */
  def perceptualHashes(media: DataFrame, side: Int = 4): DataFrame = {
    val n = side * side
    val px = resizeImagesReal(media, factor = 1)
    val m = px.groupBy("media_id")
      .agg((sum(col("pooled")) / lit(n.toDouble)).as("__mean"))
    px.join(m, "media_id")
      .groupBy("media_id")
      .agg(sum(when(col("pooled") > col("__mean"),
          expr(s"shiftleft(1L, by * $side + bx)")).otherwise(0L))
        .cast("long").as("phash"))
  }

  /** Perceptual near-duplicate image pairs: [[perceptualHashes]] +
    * banded candidate generation + exact Hamming verify — the image
    * twin of [[Dedup.simhashNearDupes]]'s band-then-verify shape. The
    * 16-bit hash splits into two 8-bit bands; by pigeonhole any pair
    * at Hamming ≤ 1 agrees on at least one full band, so recall is
    * structural, and the band-bucket join bounds candidates without
    * ever forming the n² cross product. Exact integers end-to-end —
    * the oracle can use the naive pairwise formulation (deliberately
    * NOT this banding) and still hash-match. */
  def phashNearDupes(media: DataFrame, maxHamming: Int = 1,
                     side: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 1,
      s"two 8-bit bands guarantee recall only for maxHamming <= 1, got $maxHamming")
    require(side == 4, s"the 2x8-bit banding is defined for side=4, got $side")
    val h = perceptualHashes(media, side)
    val banded = h.select(col("media_id"), col("phash"),
      explode(array(
        struct(lit(0).as("band"), col("phash").bitwiseAND(lit(255L)).as("bits")),
        struct(lit(1).as("band"), expr("shiftright(phash, 8)").as("bits"))))
        .as("b"))
      .select(col("media_id"), col("phash"),
        col("b.band").as("band"), col("b.bits").as("bits"))
    val cand = banded.as("a")
      .join(banded.as("b").hint("shuffle_merge"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
  }

  /** Metadata-only pass: cheap typed metadata without decoding —
    * pure column expressions, stays in codegen. */
  def withMetadata(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("payload_crc", crc32(col(payloadCol)))
      .withColumn("is_empty", coalesce(length(col(payloadCol)) === 0, lit(true)))

  /** STUB frame sampling for video payloads: emit every k-th "frame"
    * (fixed 4 KiB strides of the payload) with its index — the real
    * version seeks keyframes; the explode/positional plumbing is real. */
  def sampleFrames(media: DataFrame, everyK: Int = 10): DataFrame = {
    val frameSize = 4096
    media
      .withColumn("n_frames",
        greatest(ceil(length(col("payload")) / frameSize).cast("int"), lit(1)))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .withColumn("frame",
        substring(col("payload"), col("frame_idx") * frameSize + 1, lit(frameSize)))
      .select(col("media_id"), col("frame_idx"), col("frame"))
  }

  /** Build a media table from the documents testdata (text bytes stand
    * in for payloads — the container has no binary media fixtures). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("media_type"),
      encode(col("text"), "utf-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      length(col("text")).cast("long").as("n_bytes"))
}
