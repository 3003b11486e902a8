package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins without the broadcast-nested-loop trap.
  *
  * Spark plans a bare `p.ts >= i.start AND p.ts < i.end` join as BNLJ —
  * O(|points| × |intervals|) comparisons, a scale-killer the moment either
  * side outgrows one executor. The classic fix (used by every range-join
  * capable engine) is BIN BLOCKING: quantize time into fixed-width bins,
  * replicate each interval into every bin it overlaps, tag each point with
  * its single bin, and equi-join on the bin before re-checking the exact
  * predicate. The quadratic collapses to a hash join whose cost is
  * data + (interval span / bin width) replication.
  */
object RangeJoin {

  /** Inner join of `points` (event column `ptCol`, a timestamp) against
    * `intervals` ([`startCol`, `endCol`) half-open, timestamps) on
    * containment, via bin blocking at `binSeconds` granularity.
    *
    * Exactness: a point lands in exactly ONE bin; an interval is
    * replicated into EVERY bin it overlaps (`sequence` over the bin ids of
    * start and last-contained-instant), so each qualifying (point,
    * interval) pair meets exactly once and the residual predicate removes
    * same-bin non-matches. Empty intervals (end <= start) match nothing
    * and are dropped up front.
    *
    * Choosing `binSeconds`: ~the typical interval length — shorter bins
    * inflate replication, longer bins inflate residual-filter work. Bin
    * skew (all points in one hot bin) is AQE-split like any hash join.
    */
  def binnedIntervalJoin(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSeconds: Long
  ): DataFrame = {
    require(binSeconds > 0, "binnedIntervalJoin: binSeconds must be positive")
    val binMicros = binSeconds * 1000000L
    // cast-to-TIMESTAMP tolerates NTZ event columns (session tz is UTC, so
    // the micros are unchanged); the residual predicate compares the
    // original columns directly
    def micros(c: String) = s"unix_micros(cast(`$c` as timestamp))"
    val p = points.withColumn("__bin", expr(s"${micros(ptCol)} div ${binMicros}L"))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn(
        "__bin",
        explode(sequence(
          expr(s"${micros(startCol)} div ${binMicros}L"),
          expr(s"(${micros(endCol)} - 1L) div ${binMicros}L")
        ))
      )
    p.join(i, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }
}
