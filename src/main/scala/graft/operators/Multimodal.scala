package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize plumbing.
  *
  * IMAGES are decoded for real: the JDK ships codecs for png/jpeg/bmp/gif
  * (`javax.imageio`, headless-safe), so [[decodeImages]] and
  * [[resizeImages]] run actual pixel work with zero external dependencies —
  * one decoder per task via `mapPartitions` (the JVM equivalent of
  * `mapInPandas` batching), corrupt payloads degrade to an `ok=false` row
  * instead of failing the job, and the repartition-by-size pattern keeps
  * huge blobs from skewing tasks at 100 TB.
  *
  * AUDIO/VIDEO decode needs native libraries not in this container, so that
  * path stays a clearly-marked deterministic STUB ([[decodeFeatures]]) —
  * same schema/batching shape, fake features derived from md5(payload) so
  * the DuckDB oracle can still check the pipeline end to end (q42/q44).
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  final case class DecodedFeatures(mediaId: Long, format: String, width: Int, height: Int, byteLen: Long, featureHash: Long)

  /** Wrap raw payload columns into the canonical multimodal schema:
    * (media_id, content binary, meta struct).
    */
  def toMediaTable(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit(format).as("format"),
        octet_length(col(payloadCol).cast("binary")).as("byte_len")
      ).as("meta")
    )

  /** STUB decoder: derives deterministic fake (width,height) from the first
    * 60 bits of md5(payload) — the same portable hash as
    * [[graft.plans.Md5Prefix60]], so the DuckDB oracle reproduces it as
    * CAST(('0x'||substr(md5(payload),1,15)) AS BIGINT). A production build
    * replaces `decodeOne` with a real codec call; everything around it
    * (batching, schema, partitioning) stays.
    */
  private def decodeOne(id: Long, bytes: Array[Byte], format: String): DecodedFeatures = {
    // ??? <- real codec goes here; deterministic fake below
    val h = graft.plans.Md5Prefix60.hash(bytes)
    DecodedFeatures(id, format, (h % 1920 + 1).toInt, (h % 1080 + 1).toInt, bytes.length.toLong, h)
  }

  /** Batched decode over the media table. `mapPartitions` keeps one decoder
    * instance per task (codec init is expensive); upstream
    * `repartition` by byte size would balance blob skew on a real corpus.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("content"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-task decoder init would happen here
        it.map { case (id, bytes, fmt) => decodeOne(id, Option(bytes).getOrElse(Array.empty), fmt) }
      }
  }

  final case class ImageFeatures(
      mediaId: Long,
      format: String,
      width: Int,
      height: Int,
      byteLen: Long,
      meanLuma: Double,
      ok: Boolean
  )

  private def lumaOf(img: java.awt.image.BufferedImage): Double = {
    // subsample a bounded grid: feature cost is O(64x64) regardless of
    // image size — a 100-megapixel scan costs the same as a thumbnail
    val (w, h) = (img.getWidth, img.getHeight)
    val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
    var sum = 0.0
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        sum += 0.299 * r + 0.587 * g + 0.114 * b
        n += 1
        x += sx
      }
      y += sy
    }
    if (n == 0) 0.0 else sum / n
  }

  /** REAL image decode + feature extraction over JDK-supported formats
    * (png/jpeg/bmp/gif via `javax.imageio`, headless-safe, no external
    * libs): true pixel dimensions and a bounded-cost mean-luma feature.
    * Undecodable payloads (truncated/corrupt/unsupported) yield
    * `ok=false` with -1 dimensions — a poisoned blob must never kill a
    * 100 TB decode sweep.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("content"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // byte-array reads: no temp-file cache
        it.map { case (id, bytesOrNull, fmt) =>
          val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) ImageFeatures(id, fmt, -1, -1, bytes.length.toLong, 0.0, ok = false)
            else ImageFeatures(id, fmt, img.getWidth, img.getHeight, bytes.length.toLong, lumaOf(img), ok = true)
          } catch {
            case scala.util.control.NonFatal(_) =>
              ImageFeatures(id, fmt, -1, -1, bytes.length.toLong, 0.0, ok = false)
          }
        }
      }
  }

  /** REAL image resize: decode, scale to fit `maxDim` (aspect preserved,
    * never upscaled), re-encode as PNG. Returns the canonical media-table
    * schema so resized output feeds any downstream media operator.
    * Undecodable rows pass through unchanged (resize is best-effort
    * normalization, not validation — pair with [[decodeImages]]'s `ok`
    * flag to quarantine).
    */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int): DataFrame = {
    import spark.implicits._
    val resized = media
      .select(col("media_id"), col("content"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytesOrNull, fmt) =>
          val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
          val out =
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              if (img == null || math.max(img.getWidth, img.getHeight) <= maxDim) bytes
              else {
                val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
                val (nw, nh) = (math.max(1, (img.getWidth * scale).toInt), math.max(1, (img.getHeight * scale).toInt))
                val dst = new java.awt.image.BufferedImage(nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                try {
                  g.setRenderingHint(
                    java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
                  )
                  g.drawImage(img, 0, 0, nw, nh, null)
                } finally g.dispose()
                val buf = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(dst, "png", buf)
                buf.toByteArray
              }
            } catch { case scala.util.control.NonFatal(_) => bytes }
          (id, out, if (out eq bytes) fmt else "png")
        }
      }
      .toDF("media_id", "payload", "fmt")
    resized.select(
      col("media_id"),
      col("payload").as("content"),
      struct(col("fmt").as("format"), octet_length(col("payload")).as("byte_len")).as("meta")
    )
  }

  /** Deterministic solid-gray PNG via the JDK encoder — the synthetic-image
    * fixture for oracle-checking the REAL decode path: PNG is lossless, so
    * [[decodeImages]] on this payload must return exactly (w, h) and a mean
    * luma of exactly `gray` (every pixel identical), all predictable by a
    * SQL oracle from the generating arithmetic alone.
    */
  def encodeSolidPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** Frame-sample plumbing: N deterministic sample offsets per media row
    * (a video decoder would seek to these). Pure expression.
    */
  def frameSampleOffsets(media: DataFrame, n: Int): DataFrame =
    media.withColumn(
      "frame_offsets",
      transform(sequence(lit(0), lit(n - 1)), i => floor(i * octet_length(col("content")) / n).cast("long"))
    )
}
