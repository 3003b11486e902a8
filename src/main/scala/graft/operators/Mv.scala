package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance from a change-data feed
  * ([[graft.sources.VersionedTable.changeFeed]]).
  *
  * The consumer of a 100 TB warehouse table should never recompute a
  * downstream aggregate from a full snapshot when a commit touched 0.1% of
  * rows. Count/sum aggregates are self-maintainable: every feed row
  * carries a signed delta (+1 for the row versions the new snapshot has,
  * -1 for the ones it lost), and folding those deltas into the stored view
  * reproduces the recomputed view EXACTLY — which is what the oracle
  * asserts, by recomputing relationally and hash-comparing.
  */
object Mv {

  /** Maintain a (count, sum) view grouped by `keyExpr` under a change
    * feed.
    *
    * `base`: the stored view at the feed's from-version — schema
    * (view_key, n_rows, cents).
    * `feed`: change rows between the versions, with a `_change_type` in
    * {insert, delete, update_preimage, update_postimage}.
    * `rowPred`: which row versions the view aggregates at all (e.g.
    * SCD-2 active rows only) — pre/post images are judged INDIVIDUALLY,
    * so an update that flips a row out of the predicate contributes the
    * retraction without an addition, exactly like a delete would.
    * `centsExpr`: the summed measure, integer units.
    *
    * Scale: one aggregation of the feed (O(changed rows)) to per-key
    * deltas, then one outer join against the view at VIEW-KEY grain —
    * never a snapshot scan. Keys whose row count returns to zero leave
    * the view.
    */
  def maintainCountSum(
      base: DataFrame,
      feed: DataFrame,
      keyExpr: Column,
      rowPred: Column,
      centsExpr: Column,
      changeTypeCol: String = "_change_type"
  ): DataFrame = {
    val sign = when(!rowPred, lit(0L))
      .when(col(changeTypeCol).isin("insert", "update_postimage"), lit(1L))
      .when(col(changeTypeCol).isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(lit("maintainCountSum: unknown change type "), col(changeTypeCol))))
    val deltas = feed
      .select(keyExpr.as("view_key"), sign.as("s"), centsExpr.as("c"))
      .groupBy(col("view_key"))
      .agg(sum(col("s")).as("d_rows"), sum(col("s") * col("c")).as("d_cents"))
    base
      .join(deltas, Seq("view_key"), "full_outer")
      .select(
        col("view_key"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L))).as("n_rows"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L))).as("cents")
      )
      .filter(col("n_rows") > 0)
  }

  /** The stored-view bootstrap: the same (count, sum) aggregate computed
    * from a snapshot — used once at view creation (and by tests to prove
    * maintain(base, feed) == bootstrap(next snapshot)).
    */
  def bootstrapCountSum(snapshot: DataFrame, keyExpr: Column, centsExpr: Column): DataFrame =
    snapshot
      .groupBy(keyExpr.as("view_key"))
      .agg(count(lit(1)).as("n_rows"), sum(centsExpr).as("cents"))
}
