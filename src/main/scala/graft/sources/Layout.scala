package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout clustering: Z-ORDER (Morton-curve) multi-column
  * clustering — the Delta `OPTIMIZE ZORDER BY` analogue for the engine's
  * parquet warehouse.
  *
  * Why it matters at 100 TB: parquet scans skip files/row-groups whose
  * min/max stats exclude the predicate. A linear sort clusters ONE column —
  * predicates on any other column match every file. Interleaving the bits
  * of k scaled columns makes file ranges compact in ALL k dimensions, so a
  * predicate on any clustered column prunes ~n^((k-1)/k) of the files
  * instead of none.
  *
  * Shape: one bounded stats job (per-column min/max — or pass known
  * bounds), then `repartitionByRange` on the z-value (sampled range
  * boundaries, no global sort) + a local sort within each partition. The
  * z-value is a pure codegen'd expression; nothing driver-sized.
  *
  * Linear min/max scaling is used for the per-column quantization —
  * heavily skewed columns should be pre-transformed (log, rank-bucketed)
  * by the caller, the same guidance Delta gives for ZORDER columns.
  */
object Layout {

  /** Morton z-value: interleave `bits` bits of each column's scaled rank.
    * `specs` = (column, min, max) per clustered column; k*bits must fit a
    * long (k*bits <= 63).
    */
  def zValue(specs: Seq[(Column, Double, Double)], bits: Int): Column = {
    val k = specs.size
    require(k >= 1, "need at least one clustering column")
    require(k * bits <= 63, s"$k cols x $bits bits exceeds a long")
    val maxV = (1L << bits) - 1
    val scaled = specs.map { case (c, mn, mx) =>
      val range = mx - mn
      if (range <= 0) lit(0L)
      else
        least(
          greatest(floor((c.cast("double") - lit(mn)) / lit(range) * lit(maxV.toDouble)), lit(0.0)),
          lit(maxV.toDouble)
        ).cast("long")
    }
    (0 until bits)
      .flatMap { b =>
        scaled.zipWithIndex.map { case (s, ci) =>
          // bit b of column ci lands at position b*k + ci
          shiftleft(shiftrightunsigned(s, b).bitwiseAND(lit(1L)), b * k + ci)
        }
      }
      .reduce(_ bitwiseOR _)
  }

  /** Cluster `df` by the z-order of `cols` into ~`numFiles` files at
    * `path`. One stats job for the bounds, one ranged shuffle, local sorts;
    * the helper column is dropped before write (ordering survives the
    * projection).
    */
  def zOrderWrite(df: DataFrame, cols: Seq[String], path: String, numFiles: Int, bits: Int = 12): Unit = {
    val aggExprs = cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    // empty input / all-null column => null min/max; fall back to a 0-width
    // range (zValue already maps range <= 0 to bucket 0) instead of NPE-ing
    // a routine rewrite of an empty partition
    def d(i: Int): Double = if (stats.isNullAt(i)) 0.0 else stats.getDouble(i)
    val specs = cols.zipWithIndex.map { case (c, i) => (col(c), d(2 * i), d(2 * i + 1)) }
    df.withColumn("__z", zValue(specs, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** File-skipping effectiveness probe: how many files of a parquet dir
    * could contain rows with `valueCol` in [lo, hi], judged by per-file
    * min/max — exactly the decision a stats-based reader makes. One scan
    * grouped by file name; used by specs and layout audits.
    */
  def filesPossiblyMatching(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      valueCol: String,
      lo: Double,
      hi: Double
  ): (Int, Int) = {
    val perFile = spark.read
      .parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(valueCol).cast("double")).as("mn"), max(col(valueCol).cast("double")).as("mx"))
      .collect()
    val total = perFile.length
    // a file whose values are all null has null stats: it cannot contain a
    // row in [lo, hi], count it as non-matching (not NPE)
    val matching = perFile.count(r =>
      !r.isNullAt(1) && !r.isNullAt(2) && r.getDouble(1) <= hi && r.getDouble(2) >= lo
    )
    (matching, total)
  }
}
