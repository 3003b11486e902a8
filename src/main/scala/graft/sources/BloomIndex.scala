package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PER-PARTITION BLOOM-FILTER INDEX over a versioned table — the Delta
  * bloom-index analogue, for point lookups on a column UNRELATED to the
  * partition layout (zone maps cover clustered columns; a hash-bucketed
  * or foreign-keyed layout spans the full value range of everything
  * else, and without an index a point lookup scans every partition).
  *
  * Build: ONE aggregation pass over the pinned table version — each
  * partition's key hashes fold map-side into an m-bit
  * [[graft.plans.BloomFilter.BloomAgg]] bitset — persisted as a tiny
  * parquet of (partition, bits) plus a _meta.json pinning
  * (table, version, column, m, k). At rest the index is
  * O(partitions × m/8) bytes regardless of table size.
  *
  * Probe: the index frame (one row per partition) is read and evaluated
  * DRIVER-SIDE against the probe keys; only partitions whose filter
  * claims a possible hit are opened, then the exact residual `IN` filter
  * runs on the scanned rows. False positives cost an extra partition
  * scan, never a wrong row — and the deterministic double-hash probe
  * ([[graft.plans.BloomFilter.position]]) means even the FP set replays
  * identically everywhere.
  */
object BloomIndex {

  /** Build the index for `column` at the given (default latest) version.
    * Returns the indexed table version.
    */
  def build(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      column: String,
      m: Int = 1 << 18,
      k: Int = 3,
      version: Option[Long] = None
  ): Long = {
    val v = version.orElse(VersionedTable.latestVersion(spark, tablePath)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $tablePath"))
    val partCol = VersionedTable.commitField(spark, tablePath, v, "partition_column").getOrElse(
      throw new IllegalStateException(s"$tablePath@$v is not a delta table; bloom index needs partitions"))
    val snap = VersionedTable.read(spark, tablePath, Some(v))
    snap
      .select(
        col(partCol).cast("string").as("part"),
        graft.plans.HashExpressions.md5Prefix60(col(column).cast("string")).as("h"))
      .groupBy(col("part"))
      .agg(org.apache.spark.sql.functions.udaf(new HashBloomAgg(m, k)).apply(col("h")).as("bits"))
      .write.mode("overwrite").parquet(s"$indexPath/parts")
    val metaJson =
      s"""{"table": ${graft.core.Json.str(tablePath)}, "version": $v, "column": ${graft.core.Json.str(column)}, "m": $m, "k": $k, "part_col": ${graft.core.Json.str(partCol)}}"""
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/_meta.json")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = f.create(p, true)
    o.write(metaJson.getBytes("UTF-8"))
    o.close()
    v
  }

  private def meta(spark: SparkSession, indexPath: String): com.fasterxml.jackson.databind.JsonNode = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/_meta.json")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    in.close()
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(new String(bytes, "UTF-8"))
  }

  /** Pruning decision only (exposed for tests/plan audits): partitions to
    * scan vs skip for the probe keys.
    */
  def prunePlan(spark: SparkSession, indexPath: String, keys: Seq[String]): (Seq[String], Seq[String]) =
    prunePlanWith(spark, indexPath, keys, meta(spark, indexPath))

  private def prunePlanWith(
      spark: SparkSession,
      indexPath: String,
      keys: Seq[String],
      mt: com.fasterxml.jackson.databind.JsonNode
  ): (Seq[String], Seq[String]) = {
    val (m, k) = (mt.path("m").asInt(), mt.path("k").asInt())
    val hashes = keys.map(s => graft.plans.Md5Prefix60.hash(s.getBytes("UTF-8")))
    val idx = spark.read.parquet(s"$indexPath/parts")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
    val (scan, skip) = idx.partition { case (_, bits) =>
      hashes.exists(h => graft.plans.BloomFilter.contains(bits, m, k, h))
    }
    (scan.map(_._1).sorted.toSeq, skip.map(_._1).sorted.toSeq)
  }

  /** Point lookup through the index: open only claiming partitions, then
    * the exact residual filter. Row-exact regardless of FP rate.
    */
  def lookup(spark: SparkSession, indexPath: String, keys: Seq[String]): DataFrame = {
    val mt = meta(spark, indexPath)
    val (tablePath, v) = (mt.path("table").asText(), mt.path("version").asLong())
    val (column, partCol) = (mt.path("column").asText(), mt.path("part_col").asText())
    val (scan, _) = prunePlanWith(spark, indexPath, keys, mt) // one _meta read per lookup
    val snap = VersionedTable.read(spark, tablePath, Some(v))
    val residual = col(column).cast("string").isin(keys: _*)
    if (scan.isEmpty) snap.limit(0)
    else snap.filter(col(partCol).cast("string").isin(scan: _*)).filter(residual)
  }

  /** Hash-folding twin of [[graft.plans.BloomFilter.BloomAgg]] usable as a
    * udaf over a long column in an untyped groupBy.
    */
  final class HashBloomAgg(m: Int, k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Array[Byte]] {
    private val inner = new graft.plans.BloomFilter.BloomAgg(m, k)
    override def zero: Array[Byte] = inner.zero
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = inner.reduce(b, h)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = inner.finish(r)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = inner.bufferEncoder
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = inner.outputEncoder
  }
}
