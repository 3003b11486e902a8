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
  * VIDEO container METADATA is parsed for real as well: MP4/ISO-BMFF is a
  * plain box tree (size+type headers), so [[decodeVideoMeta]] walks
  * ftyp/moov/mvhd/trak/tkhd/hdlr with no codec at all — brand, duration,
  * track dimensions, track kinds (q95 oracles it end to end). Only video
  * FRAME decode needs native codec libraries with no JDK equivalent, so
  * that one path stays a clearly-marked deterministic STUB
  * ([[decodeFeatures]], the format-agnostic fallback) — same
  * schema/batching shape, fake features derived from md5(payload) so the
  * DuckDB oracle can still check the pipeline end to end (q42/q44).
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

  /** Format-agnostic FEATURE decoder used by the generic plumbing path
    * (q42): derives deterministic (width,height) from the first 60 bits of
    * md5(payload) — the same portable hash as [[graft.plans.Md5Prefix60]],
    * so the DuckDB oracle reproduces it as
    * CAST(('0x'||substr(md5(payload),1,15)) AS BIGINT). The REAL decoders
    * live beside it — [[decodeImages]] (PNG/JPEG/GIF/BMP),
    * [[decodeAudio]] (PCM WAV/AIFF/AU), [[decodeVideoMeta]] (ISO-BMFF)
    * and [[decodeVideoFrames]] (MJPEG-AVI) — this one exists to keep the
    * schema/batching contract testable for formats the JDK can't parse.
    */
  private def decodeOne(id: Long, bytes: Array[Byte], format: String): DecodedFeatures = {
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

  /** 56-bit difference hash (dHash) per image: the perceptual fingerprint
    * image dedup pipelines use — decode, integer-luma, block-average down
    * to a 9x7 grid, then one bit per horizontally-adjacent cell pair
    * (cell < right neighbor), bit position `r*8 + c`. 9x7 instead of the
    * classic 9x8 keeps the hash in 56 bits — always non-negative in a
    * LongType, so band extraction and XOR replay identically in any
    * BIGINT engine (the same sign-safety trade as [[graft.operators.Dedup.simhash60]]).
    *
    * All arithmetic is integer-exact (luma = (299r+587g+114b)/1000, cell =
    * floor(sum/count)), so on a lossless fixture the hash is predictable
    * from the generating arithmetic alone — which is how q128's oracle
    * replays it in SQL. Cost is one bounded pass per image (every pixel
    * read once, 63 cells); undecodable payloads degrade to ok=false.
    */
  def dHash56(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val (gw, gh) = (9, 7)
    media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytesOrNull) =>
          val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) (id, 0L, false)
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val sum = Array.ofDim[Long](gh, gw)
              val cnt = Array.ofDim[Long](gh, gw)
              var y = 0
              while (y < h) {
                val r = y * gh / h
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                  val c = x * gw / w
                  sum(r)(c) += luma
                  cnt(r)(c) += 1
                  x += 1
                }
                y += 1
              }
              var hash = 0L
              var r = 0
              while (r < gh) {
                var c = 0
                while (c < gw - 1) {
                  val l = sum(r)(c) / math.max(1L, cnt(r)(c))
                  val rt = sum(r)(c + 1) / math.max(1L, cnt(r)(c + 1))
                  if (l < rt) hash |= 1L << (r * 8 + c)
                  c += 1
                }
                r += 1
              }
              (id, hash, true)
            }
          } catch {
            case scala.util.control.NonFatal(_) => (id, 0L, false)
          }
        }
      }
      .toDF("media_id", "dhash", "ok")
  }

  /** Image near-duplicate pairs by perceptual hash: [[dHash56]] each
    * decodable image, then exact-recall Hamming pairing via
    * [[graft.operators.Dedup.bandedSketchPairs]] — pigeonhole banding, no
    * all-pairs join, the image twin of text SimHash near-dup. Emits
    * (id_a, id_b, hamming) for every decodable pair within `maxHamming`.
    */
  def imageNearDup(
      spark: SparkSession,
      media: DataFrame,
      maxHamming: Int = 3,
      minChunkBits: Int = Dedup.MinChunkBits
  ): DataFrame =
    Dedup.bandedSketchPairs(
      dHash56(spark, media).filter(col("ok")).select(col("media_id").as("doc_id"), col("dhash").as("sk")),
      sketchBits = 56,
      maxHamming = maxHamming,
      minChunkBits = minChunkBits
    )

  /** Deterministic grayscale PNG from a pixel function via the JDK encoder
    * — the generic lossless fixture for oracle-checking perceptual-hash
    * paths: every pixel's gray value is `v(x, y) & 0xff`, so any
    * integer-exact downstream feature (dHash cells, luma) is predictable
    * from the generating arithmetic alone.
    */
  def encodeGrayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = v(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
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

  final case class VideoMeta(
      mediaId: Long,
      brand: String,
      durationMs: Long,
      width: Int,
      height: Int,
      nTracks: Int,
      hasVideo: Boolean,
      hasAudio: Boolean,
      ok: Boolean
  )

  /** REAL MP4/ISO-BMFF container-metadata parse — no codec needed: the
    * format is a box tree of [u32 size][4cc type] headers, so one walk
    * over ftyp → moov → { mvhd, trak → { tkhd, mdia → hdlr } } yields the
    * major brand, presentation duration (mvhd duration/timescale, v0 and
    * v1 layouts), per-track 16.16 fixed-point dimensions (the video
    * track's), track count, and track kinds (`vide`/`soun` handlers).
    * This is the same metadata walk ffprobe does before any codec loads;
    * FRAME decode needs a codec — real and jar-less for MJPEG-AVI
    * ([[decodeVideoFrames]]); native libs for inter-frame codecs.
    * Truncated/garbage containers yield
    * `ok=false` with -1 sentinels — same `mapPartitions` batching and
    * poisoned-blob discipline as [[decodeImages]]/[[decodeAudio]].
    */
  def decodeVideoMeta(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
        parseMp4Meta(bytes) match {
          case Some((brand, durMs, w, h, n, hasV, hasA)) =>
            VideoMeta(id, brand, durMs, w, h, n, hasV, hasA, ok = true)
          case None => VideoMeta(id, "", -1L, -1, -1, -1, hasVideo = false, hasAudio = false, ok = false)
        }
      })
  }

  /** Driver-free pure parse; None on any structural violation. */
  private[graft] def parseMp4Meta(bytes: Array[Byte]): Option[(String, Long, Int, Int, Int, Boolean, Boolean)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
        // (type, payloadStart, payloadEnd) of each box in [from, to)
        var out = Vector.empty[(String, Int, Int)]
        var p = from
        while (p < to) {
          if (p + 8 > to) throw new IllegalArgumentException("truncated box header")
          val size = bb.getInt(p).toLong & 0xffffffffL
          val tpe = new String(bytes, p + 4, 4, "ISO-8859-1")
          val (payload, end) =
            if (size == 1) { // 64-bit largesize
              if (p + 16 > to) throw new IllegalArgumentException("truncated largesize")
              val ls = bb.getLong(p + 8)
              (p + 16, p + ls)
            } else if (size == 0) (p + 8, to.toLong) // box extends to EOF
            else (p + 8, p + size)
          // end < payload catches structurally invalid sizes 1..7 (a size
          // that would put the payload end before its start would silently
          // read the NEXT box's header bytes as this box's payload)
          if (end > to || end < payload) throw new IllegalArgumentException("box overruns container")
          out :+= ((tpe, payload, end.toInt))
          p = end.toInt
        }
        out
      }
      val top = boxes(0, bytes.length)
      val brand = top.find(_._1 == "ftyp").map { case (_, s, _) =>
        new String(bytes, s, 4, "ISO-8859-1")
      }.getOrElse(throw new IllegalArgumentException("no ftyp"))
      val (moovS, moovE) = top.find(_._1 == "moov").map(b => (b._2, b._3))
        .getOrElse(throw new IllegalArgumentException("no moov"))
      val moov = boxes(moovS, moovE)
      val durMs = moov.find(_._1 == "mvhd").map { case (_, s, _) =>
        val version = bytes(s) & 0xff
        if (version == 1) {
          val timescale = bb.getInt(s + 4 + 16).toLong & 0xffffffffL
          val duration = bb.getLong(s + 4 + 20)
          if (timescale == 0) 0L else duration * 1000L / timescale
        } else {
          val timescale = bb.getInt(s + 4 + 8).toLong & 0xffffffffL
          val duration = bb.getInt(s + 4 + 12).toLong & 0xffffffffL
          if (timescale == 0) 0L else duration * 1000L / timescale
        }
      }.getOrElse(throw new IllegalArgumentException("no mvhd"))
      val traks = moov.filter(_._1 == "trak")
      var (w, h) = (0, 0)
      var (hasV, hasA) = (false, false)
      traks.foreach { case (_, ts, te) =>
        val trak = boxes(ts, te)
        val dims = trak.find(_._1 == "tkhd").map { case (_, s, _) =>
          val version = bytes(s) & 0xff
          // after ver/flags + times/id/duration: reserved(8) +
          // layer/alternate/volume/reserved(8) + matrix(36) = 52 to width
          val fixedAt = s + (if (version == 1) 4 + 32 + 52 else 4 + 20 + 52)
          (bb.getInt(fixedAt) >>> 16, bb.getInt(fixedAt + 4) >>> 16)
        }
        val handler = trak.find(_._1 == "mdia").toSeq.flatMap { case (_, ms, me) =>
          boxes(ms, me).find(_._1 == "hdlr").map { case (_, s, _) =>
            new String(bytes, s + 8, 4, "ISO-8859-1")
          }
        }.headOption
        handler match {
          case Some("vide") =>
            hasV = true
            dims.foreach { case (dw, dh) => if (dw > 0) { w = dw; h = dh } }
          case Some("soun") => hasA = true
          case _            => ()
        }
      }
      Some((brand, durMs, w, h, traks.size, hasV, hasA))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic minimal-but-spec-compliant MP4 for oracle-checking the
    * REAL container walk: full-size mvhd/tkhd v0 boxes, identity matrix,
    * a `vide` track at (w<<16, h<<16) fixed-point dims and optionally a
    * `soun` track — every field [[parseMp4Meta]] reads is predictable from
    * the generating arithmetic.
    */
  def encodeMp4(w: Int, h: Int, timescale: Int, duration: Long, withAudio: Boolean): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("ISO-8859-1") ++ payload
    val identityMatrix =
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000L) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0) ++ "isom".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd",
      be32(0) /* v0 + flags */ ++ be32(0) ++ be32(0) /* ctime mtime */ ++
        be32(timescale.toLong) ++ be32(duration) ++
        be32(0x00010000L) /* rate */ ++ Array[Byte](0x01, 0x00) /* volume */ ++
        new Array[Byte](10) ++ identityMatrix ++ new Array[Byte](24) ++ be32(3) /* next track */)
    def tkhd(trackId: Int, tw: Int, th: Int) = box("tkhd",
      be32(7) /* v0, enabled flags */ ++ be32(0) ++ be32(0) ++ be32(trackId.toLong) ++ be32(0) ++
        be32(duration) ++ new Array[Byte](8) ++ new Array[Byte](8) /* layer..volume */ ++
        identityMatrix ++ be32(tw.toLong << 16) ++ be32(th.toLong << 16))
    def hdlr(kind: String) = box("hdlr",
      be32(0) ++ be32(0) ++ kind.getBytes("ISO-8859-1") ++ new Array[Byte](12) ++ Array[Byte](0))
    def trak(trackId: Int, tw: Int, th: Int, kind: String) =
      box("trak", tkhd(trackId, tw, th) ++ box("mdia", hdlr(kind)))
    val tracks = trak(1, w, h, "vide") ++ (if (withAudio) trak(2, 0, 0, "soun") else Array.empty[Byte])
    ftyp ++ box("moov", mvhd ++ tracks) ++ box("mdat", Array[Byte](0, 1, 2, 3))
  }

  /** Frame-sample plumbing: N deterministic sample offsets per media row
    * (a video decoder would seek to these). Pure expression.
    */
  def frameSampleOffsets(media: DataFrame, n: Int): DataFrame =
    media.withColumn(
      "frame_offsets",
      transform(sequence(lit(0), lit(n - 1)), i => floor(i * octet_length(col("content")) / n).cast("long"))
    )

  final case class VideoFrame(
      mediaId: Long,
      frameIdx: Int,
      width: Int,
      height: Int,
      lumaE2: Long,
      ok: Boolean
  )

  /** REAL video FRAME decode for the one codec the JDK ships: MJPEG in an
    * AVI/RIFF container — each frame is an independent JPEG chunk
    * (`00dc`/`00db` inside the `movi` LIST), so the decode is a RIFF walk
    * plus `javax.imageio` per frame, no native libs. This closes the last
    * declared stub on the multimodal board with a working decoder; modern
    * inter-frame codecs (H.264/VP9/AV1) still require native decoders a
    * jar-less deployment can't carry, and a production build would swap
    * this decoder's body for an FFI call while keeping everything around
    * it (schema, batching, poisoned-blob discipline) unchanged.
    *
    * One output row per decoded frame: (mediaId, frameIdx, decoded width/
    * height, `floor(meanLuma*100)` over all pixels). A malformed container,
    * zero-frame stream, or any undecodable frame yields ONE `ok=false`
    * sentinel row for the media id — a poisoned blob must never kill a
    * 100 TB sweep, and a half-decoded video is treated as bad wholesale
    * (partial frame sets would silently skew downstream sampling).
    */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    def bad(id: Long) = Seq(VideoFrame(id, -1, -1, -1, -1L, ok = false))
    media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
        parseAviFrames(bytes) match {
          case None => bad(id)
          case Some(frames) if frames.isEmpty => bad(id)
          case Some(frames) =>
            try {
              // eager per-media materialization so a bad frame anywhere in
              // the stream downgrades the WHOLE media row (see scaladoc)
              frames.zipWithIndex.map { case (jpg, i) =>
                val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
                if (img == null) throw new IllegalArgumentException(s"frame $i not decodable")
                var sum = 0.0
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                    x += 1
                  }
                  y += 1
                }
                val lumaE2 = math.floor(sum / (img.getWidth.toLong * img.getHeight) * 100.0).toLong
                VideoFrame(id, i, img.getWidth, img.getHeight, lumaE2, ok = true)
              }
            } catch { case scala.util.control.NonFatal(_) => bad(id) }
        }
      })
  }

  /** RIFF/AVI chunk walk: the JPEG payload of every `..dc`/`..db` chunk
    * inside `movi` LISTs, in stream order. None for anything malformed —
    * wrong magic, a chunk overrunning its parent, a truncated header.
    * (RIFF sizes are little-endian, unlike ISO-BMFF's big-endian boxes.)
    */
  private[graft] def parseAviFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      def le32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      def cc(off: Int): String = new String(bytes, off, 4, "ISO-8859-1")
      require(bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ", "not a RIFF/AVI container")
      val riffEnd = 8 + le32(4)
      require(riffEnd <= bytes.length, "RIFF size overruns the payload")
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def walk(from: Long, to: Long, inMovi: Boolean): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = cc(off.toInt)
          val sz = le32(off.toInt + 4)
          val body = off + 8
          require(body + sz <= to, s"chunk $id overruns its parent")
          if (id == "LIST") {
            require(sz >= 4, "LIST chunk too short for a kind code")
            walk(body + 4, body + sz, inMovi = cc(body.toInt) == "movi")
          } else if (inMovi && sz > 0 && (id.endsWith("dc") || id.endsWith("db"))) {
            frames += java.util.Arrays.copyOfRange(bytes, body.toInt, (body + sz).toInt)
          }
          off = body + sz + (sz & 1) // chunks pad to even offsets
        }
      }
      walk(12, riffEnd, inMovi = false)
      Some(frames.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic MJPEG-in-AVI fixture for oracle-checking the REAL frame
    * decode: one solid-gray JPEG frame per entry of `grays`, wrapped in a
    * spec-compliant RIFF (avih + vids/MJPG strl + movi of `00dc` chunks).
    * Frame count and dimensions are exactly predictable from the
    * generating arithmetic; the decoded luma of a solid-gray JPEG is
    * spec-checked with a +-2 rounding tolerance (DCT quantization), so
    * only structural fields enter the hash-exact oracle.
    */
  def encodeMjpegAvi(w: Int, h: Int, grays: Seq[Int], fps: Int = 10): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0, s"encodeMjpegAvi: bad dims/fps ($w x $h @ $fps)")
    require(grays.nonEmpty && grays.forall(g => g >= 0 && g <= 255), "encodeMjpegAvi: grays must be 0..255")
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    def chunk(id: String, payload: Array[Byte]) =
      cc(id) ++ le32(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, payload: Array[Byte]) = chunk("LIST", cc(kind) ++ payload)
    val jpegs = grays.map { g =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val gfx = img.createGraphics()
      gfx.setColor(new java.awt.Color(g, g, g))
      gfx.fillRect(0, 0, w, h)
      gfx.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val maxSz = jpegs.map(_.length).max.toLong
    val avih = chunk("avih",
      le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(grays.length.toLong) ++ le32(0) ++ le32(1) ++ le32(maxSz) ++
        le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16))
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) ++ le32(fps.toLong) ++ le32(0) ++ le32(grays.length.toLong) ++
        le32(maxSz) ++ le32(0xffffffffL) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++ cc("MJPG") ++
        le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val payload = cc("AVI ") ++ list("hdrl", avih ++ list("strl", strh ++ strf)) ++ movi
    cc("RIFF") ++ le32(payload.length.toLong) ++ payload
  }
}
