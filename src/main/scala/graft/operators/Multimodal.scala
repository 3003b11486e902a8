package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract plumbing.
  *
  * The real decode step needs native imaging/audio libraries that are not in
  * this container, so the decoder below is a clearly-marked deterministic
  * STUB — but the Spark-side plumbing is real: schema shape, per-partition
  * batched processing (`mapPartitions`, so a real decoder would amortize its
  * init cost per task, the JVM equivalent of `mapInPandas` batching),
  * and the repartition-by-size pattern that keeps huge blobs from skewing
  * tasks at 100 TB.
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

  /** Frame-sample plumbing: N deterministic sample offsets per media row
    * (a video decoder would seek to these). Pure expression.
    */
  def frameSampleOffsets(media: DataFrame, n: Int): DataFrame =
    media.withColumn(
      "frame_offsets",
      transform(sequence(lit(0), lit(n - 1)), i => floor(i * octet_length(col("content")) / n).cast("long"))
    )
}
