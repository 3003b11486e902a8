package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC warehouse escape hatch (reference: loading.py:1997-1999 loads
  * Redshift through a driver-side psycopg2 connection — serial, row-wise).
  * The engine's primary warehouse is the parquet/VersionedTable layout;
  * this adapter is for the deployments that still need rows in an external
  * RDBMS, using Spark's distributed JDBC datasource instead of a
  * driver-side connection:
  *
  *  - writes run one connection PER PARTITION with JDBC batch inserts —
  *    throughput scales with executors until the database side saturates
  *    (the psycopg2 shape caps at one driver connection no matter the
  *    cluster size);
  *  - `coalesceTo` bounds the write parallelism: a 1000-partition
  *    DataFrame must not open 1000 connections against a warehouse with a
  *    connection budget — pick the budget explicitly;
  *  - reads of big tables go through [[readPartitioned]]: numPartitions
  *    range-predicate scans in parallel, vs one serial result set.
  *
  * Verified end-to-end against embedded Derby (the JDBC engine shipped
  * with Spark) in JdbcSpec — same datasource code path as
  * Redshift/Postgres, only the URL/driver differ.
  */
object Jdbc {

  /** Distributed JDBC load. `mode=Overwrite` drops-and-recreates (the
    * reference's staging "truncate + load"); `Append` is the incremental
    * path. Batch size is the rows-per-round-trip lever.
    */
  def writeTable(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Overwrite,
      batchSize: Int = 10000,
      coalesceTo: Option[Int] = None
  ): Unit = {
    val bounded = coalesceTo.map(df.coalesce).getOrElse(df)
    bounded.write
      .mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .save()
  }

  /** Whole-table read — one partition, for small dims/config tables only. */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** Range-partitioned parallel read: `numPartitions` concurrent scans,
    * each with a `partCol BETWEEN ...` pushdown predicate — the only shape
    * that moves a big table out of an RDBMS in reasonable time.
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partCol: String,
      lower: Long,
      upper: Long,
      numPartitions: Int
  ): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
