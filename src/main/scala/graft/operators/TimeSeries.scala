package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series shaping over event streams: regular-grid gap fill,
  * ordered-step funnels, and cohort retention. All value math is
  * integer-cents (decimal-cast then scaled), so both oracle engines sum
  * exactly and results are order-independent.
  *
  * Scale shape shared by all three: one aggregation to the per-(key, day)
  * grain first — the corpus-sized input collapses to |keys| x |days| rows
  * before any window or join runs, so the expensive operators downstream
  * touch the REDUCED relation only.
  */
object TimeSeries {

  /** GAP FILL + LOCF: aggregate events to a per-(key, day) daily series,
    * then densify each key's span (min..max observed day, `sequence` +
    * explode — no driver-side calendar) and carry the last observed value
    * forward across the introduced gaps.
    *
    * Output grain: one row per (key, day in span). `cents_locf` is the
    * carried value, `n_events` is 0 on gap days, `is_gap` marks them.
    * The first day of every span is observed by construction (the span
    * starts at the key's min day), so LOCF never sees a leading null and
    * the carried value is total: no row leaves with a null fill.
    *
    * Scale: the grid explode is bounded by span-days per key, not event
    * count; the single window (partition key, order day) runs on the
    * densified grid which is already the output size. Keys partition the
    * window — no global sort anywhere.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(
        sum((col(valueCol).cast("decimal(18,2)") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_events")
      )
    val spans = daily
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = spans
      .select(col(keyCol), explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      .select(col(keyCol), col("day").cast("date").as("day"))
    val joined = grid.join(daily, Seq(keyCol, "day"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("cents_locf", last(col("cents"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("cents").isNull)
      .select(col(keyCol), col("day"), col("cents_locf"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("is_gap"))
  }

  /** ORDERED-STEP FUNNEL: how many users complete step k of `steps` in
    * order, where each step's event must occur STRICTLY AFTER the user's
    * earliest completion of the previous step (the standard
    * earliest-completion funnel semantic — greedy per step, which reaches
    * every user any assignment could reach for min-ordered funnels).
    *
    * Output: one row per step — (step, step_name, n_users), n_users
    * non-increasing in step.
    *
    * Scale: one filtered aggregation per step, each keyed by user — k
    * shuffles of user-grain (not event-grain) relations after the first;
    * the per-type filters push down to the scan. No windows over the raw
    * event stream.
    */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: at least one step")
    val spark = events.sparkSession
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts"))
    val perStep: Seq[DataFrame] = steps.tail.scanLeft(first) { (prev, stepName) =>
      val p = prev.select(col(userCol), col("step_ts").as("prev_ts"))
      events.filter(col(typeCol) === stepName)
        .join(p, userCol)
        .filter(col(tsCol) > col("prev_ts"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts"))
    }
    val counts = perStep.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("int").as("step"), lit(name).as("step_name"), col("n_users"))
    }
    counts.reduce(_.unionByName(_))
  }

  /** COHORT RETENTION: users cohorted by their first-activity day; for
    * each (cohort_day, day_offset) the number of cohort users active
    * exactly `day_offset` days after their first day.
    *
    * Scale: distinct-(user, day) first (event-grain collapses to
    * activity-grain), then one broadcast-size join back to the per-user
    * cohort table — users with billions of events cost their distinct
    * active-day count, nothing more.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val activity = events
      .select(col(userCol), col(tsCol).cast("date").as("day"))
      .distinct()
    val cohorts = activity.groupBy(col(userCol)).agg(min(col("day")).as("cohort_day"))
    activity
      .join(cohorts, userCol)
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** EVENT-DECAYED VALUE PER KEY (the exponentially-decayed counter
    * behind recency features, abuse scoring, trending detection):
    * fold the key's events in (ts, id) order with
    * `acc' = floor(acc * decayE4 / 1e4) + value_cents` — each newer
    * event discounts everything before it by `decayE4/1e4`. The decay is
    * EVENT-INDEXED (one step per event, deterministic) rather than
    * wall-clock-exponentiated — no floating pow, so the fold is exact
    * integer arithmetic both engines replay bit-for-bit (the floor's
    * operands stay far below 2^53, where the IEEE division is exact).
    *
    * SCALE: one shuffle on the key; per-key state is the event list of
    * that key only (bounded by per-key activity, not the corpus). The
    * streaming twin is a `mapGroupsWithState` counter holding just
    * (acc, last_ts) — this batch formulation is its replayable oracle.
    */
  def decayedValue(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      decayE4: Long
  ): DataFrame = {
    require(decayE4 >= 0 && decayE4 <= 10000, s"decayE4=$decayE4 must be in [0, 10000]")
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    events
      .select(col(keyCol), struct(col(tsCol), col(idCol), cents.as("__cents")).as("__e"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("__e"))).as("__es"))
      .select(
        col(keyCol),
        size(col("__es")).cast("long").as("n_events"),
        aggregate(
          transform(col("__es"), e => e.getField("__cents")),
          lit(0L),
          (acc, v) => floor(acc * lit(decayE4) / lit(10000L)).cast("long") + v
        ).as("decayed_cents")
      )
  }
}
