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
  * AUDIO is decoded for real too: the JDK ships a WAV/PCM codec
  * (`javax.sound.sampled`, pure Java, headless-safe), so [[decodeAudio]]
  * parses actual RIFF containers and PCM frames — sample rate, channels,
  * bit depth, frame count, peak and RMS — with the same corrupt-row
  * degradation as images (q94 oracles it end to end).
  *
  * VIDEO decode needs native codec libraries that have no JDK equivalent
  * and are not in this container, so that one path stays a clearly-marked
  * deterministic STUB ([[decodeFeatures]], the format-agnostic fallback) —
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

  final case class AudioFeatures(
      mediaId: Long,
      format: String,
      sampleRate: Int,
      channels: Int,
      bits: Int,
      nFrames: Long,
      durationMs: Long,
      peak: Int,
      rmsE2: Long,
      ok: Boolean
  )

  /** REAL audio decode + feature extraction for JDK-supported containers
    * (WAV/AIFF/AU PCM via `javax.sound.sampled` — pure Java, no native
    * codecs): true header metadata (sample rate, channels, bit depth,
    * frame count) plus per-sample stats (peak amplitude, RMS scaled to
    * `floor(rms·100)`). Undecodable payloads — truncated containers,
    * non-PCM encodings, any bit depth other than 16 — yield `ok=false`
    * with -1 sentinels; a poisoned blob must never kill a 100 TB sweep.
    * Same `mapPartitions` batching as [[decodeImages]].
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    def bad(id: Long, fmt: String) = AudioFeatures(id, fmt, -1, -1, -1, -1L, -1L, -1, -1L, ok = false)
    media
      .select(col("media_id"), col("content"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull, fmt) =>
          val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
          try {
            val ais = javax.sound.sampled.AudioSystem
              .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
            try {
              val af = ais.getFormat
              val pcm = af.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              if (!pcm || af.getSampleSizeInBits != 16) bad(id, fmt)
              else {
                val data = ais.readAllBytes()
                val nSamples = data.length / 2
                val nFrames = nSamples / af.getChannels
                var i = 0
                var peak = 0
                var sumSq = 0.0
                while (i + 1 < data.length) {
                  val s =
                    if (af.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
                    else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toInt
                  val a = math.abs(s)
                  if (a > peak) peak = a
                  sumSq += s.toDouble * s
                  i += 2
                }
                val rate = math.round(af.getSampleRate).toInt
                val rmsE2 =
                  if (nSamples == 0) 0L
                  else math.floor(math.sqrt(sumSq / nSamples) * 100.0).toLong
                AudioFeatures(
                  id, fmt, rate, af.getChannels, af.getSampleSizeInBits,
                  nFrames.toLong, nFrames.toLong * 1000L / rate, peak, rmsE2, ok = true
                )
              }
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => bad(id, fmt) }
        }
      }
  }

  /** Deterministic 16-bit mono PCM WAV via the JDK encoder — the synthetic
    * fixture for oracle-checking the REAL audio decode path: samples
    * alternate +amp, -amp (a square wave at Nyquist), so every stat is
    * integer-predictable — peak = amp, RMS = exactly amp (sum of squares is
    * n·amp², all exact in IEEE 754 at these magnitudes), frames = n,
    * duration = n·1000/rate truncated.
    */
  def encodePcmWav(sampleRate: Int, nSamples: Int, amp: Int): Array[Byte] = {
    require(amp >= 0 && amp <= 32767, s"amp $amp outside 16-bit signed range")
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = if (i % 2 == 0) amp else -amp
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val af = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), af, nSamples.toLong
    )
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
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
