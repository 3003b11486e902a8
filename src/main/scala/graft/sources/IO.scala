package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Option-correct sources and sinks for the engine (SURVEY.md §2.1, S1-S14).
  *
  * Each wrapper pins the exact dialect the reference produced/consumed so a
  * byte-for-byte staged file round-trips:
  *  - pipe-CSV with header and double-quote quoting (cleansing.py:34,
  *    transformation.py:410, loading.py:26-30)
  *  - multiLine JSON arrays as landed by the ingest stage (ingestion.py:273-279)
  *  - gzip report CSV with malformed-line drop (ingestion.py:82)
  *  - `-` as the null sentinel (ingestion.py:83, transformation.py:306)
  *
  * All of these return lazy DataFrames — filters and column pruning applied
  * downstream are pushed into the scan by Catalyst, and compressed CSV/JSON
  * splits parallelize per-file, so at scale ingest throughput is bounded by
  * object-store bandwidth, not this layer.
  */
object IO {

  /** S1: JSON document source (list-of-JSON-objects per file, pretty-printed
    * so multiLine is required).
    */
  def readJsonDocs(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S2: gzip (or plain) report CSV: header, tolerate bad lines, `-` -> null.
    * Codec is auto-detected from the extension by Spark.
    */
  def readReportCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("nullValue", "-")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** S3: CSV with header + schema inference (DQ demo shape). */
  def readCsvInfer(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").option("sep", sep).csv(path)

  /** S4: tab-separated variant. */
  def readTsv(spark: SparkSession, path: String): DataFrame = readCsvInfer(spark, path, "\t")

  /** S5: text file as one-column DataFrame (key files etc.). */
  def readText(spark: SparkSession, path: String): DataFrame = spark.read.text(path)

  /** Pipe-CSV staged-table source (the inter-stage wire format). */
  def readPipeCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", "true")
      .option("sep", "|")
      .option("quote", "\"")
      .option("nullValue", "-")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** S9: pipe-CSV sink (header, quote `"`), partitioned by date columns when
    * present. One file per partition dir would be `coalesce(1)` — we do NOT
    * do that: at scale you want one file per task.
    */
  def writePipeCsv(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode("overwrite")
      .option("header", "true")
      .option("sep", "|")
      .option("quote", "\"")
      // the pinned wire dialect's null sentinel — readPipeCsv maps it back,
      // so null survives a write->read round trip instead of decaying to ""
      .option("nullValue", "-")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).csv(path)
  }

  /** S10: JSON sink. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC sink/source: the second columnar wire format Spark ships a native
    * vectorized reader for — interchange with Hive/Trino estates that
    * standardized on ORC. Same pushdown story as parquet: predicates and
    * column pruning reach the ORC scan (PlanQualitySpec guards the plan),
    * so a filtered read of an ORC export costs the stripes it needs, not
    * the file.
    */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S11/S12-equivalent warehouse sink: columnar parquet, partitioned.
    * `mergeSchema` on read covers the reference's schema-evolution behavior
    * (great_expectations.py:337-338).
    */
  def writeWarehouse(df: DataFrame, path: String, partitionCols: Seq[String] = Nil, mode: String = "append"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  def readWarehouse(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Bucketed warehouse table: co-locates rows by key hash at write time so
    * subsequent equi-joins/aggregations on the bucket key run shuffle-free
    * (SortMergeJoin with no Exchange). At 100 TB this is THE lever for the
    * repeated fact-fact joins: pay the shuffle once at load, never per
    * query. Requires a metastore-backed table (saveAsTable).
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String, numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w).saveAsTable(table)
  }

  /** S14: file discovery under a prefix (Hadoop FS glob — the Spark-native
    * replacement for the reference's S3 list_objects loop,
    * partitioning.py:28-32).
    */
  def listFiles(spark: SparkSession, glob: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(path)).getOrElse(Array.empty)
    statuses.filter(_.isFile).map(_.getPath.toString).toSeq
  }

  /** Read a named testdata table (driver harness layout, TESTDATA.md).
    *
    * The driver's events.ts encoding has varied across rounds; both forms
    * normalize to a session-TZ TIMESTAMP so every downstream consumer
    * (unix_micros, Row.getTimestamp, watermarks) sees one type:
    *   - parquet TIMESTAMP(NANOS): Spark 4 rejects it outright, so read as
    *     raw nanos (`nanosAsLong`) and integer-divide to µs — lossless for
    *     this data and precision-safe (no double arithmetic on epoch-nanos);
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): surfaces as
    *     TIMESTAMP_NTZ under default NTZ inference; cast to TIMESTAMP —
    *     epoch-exact because the session timezone is pinned to UTC
    *     (core/Sessions.scala, TestSpark).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
