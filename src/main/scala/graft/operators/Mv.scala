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

  /** Incremental maintenance of a KEYED equi-join view V = A ⋈ B, where
    * each side holds at most one current row per join key (the SCD-2
    * "latest" / dimension shape). Change feeds from EITHER side name the
    * touched keys; the view rows for exactly those keys are recomputed
    * from the two current snapshots restricted to them, and every other
    * view row carries forward IDENTICALLY (an anti join — no recompute,
    * no rewrite). A key whose A row was deleted, or whose B row vanished,
    * naturally leaves the view because the restricted inner join drops it.
    *
    * Scale: O(changed keys), never a snapshot join — the touched-key set
    * is feed-sized, so both semi-join restrictions and the carry anti-join
    * broadcast it; at warehouse scale the caller additionally reads the
    * two sides bucket-pruned by the touched keys' buckets (the
    * key-bucketed layout makes that driver metadata, q148's trick). The
    * maintained view must equal the full recompute at the to-versions —
    * q172's oracle hash-gates exactly that.
    *
    * @param view        stored view at the from-versions (joinKey + payload)
    * @param touchedKeys keys named by either side's change feed (any frame
    *                    with a `joinKey` column; deduplicated here)
    * @param aCurrent    side A's current rows at the to-version (one per key)
    * @param bCurrent    side B's current rows at the to-version (one per key)
    */
  def maintainKeyedJoin(
      view: DataFrame,
      touchedKeys: DataFrame,
      aCurrent: DataFrame,
      bCurrent: DataFrame,
      joinKey: String
  ): DataFrame = {
    val keys = touchedKeys.select(col(joinKey)).distinct()
    val recomputed = aCurrent
      .join(keys, Seq(joinKey), "left_semi")
      .join(bCurrent.join(keys, Seq(joinKey), "left_semi"), Seq(joinKey), "inner")
    view.join(keys, Seq(joinKey), "left_anti").unionByName(recomputed)
  }
}
