package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling primitives for training-data pipelines. No
  * `rand()` anywhere: every decision is a pure function of (id, salt), so
  * re-runs, retried tasks, and both engines of the oracle agree exactly,
  * and a sample is reproducible years later from the code alone.
  */
object Sampling {

  /** Hash bucket in [0, denom) for an id column — the shared primitive
    * under stratified splits (q62) and mixture sampling. md5-prefix based,
    * so DuckDB reproduces it as
    * `CAST(('0x'||substr(md5(id||salt),1,15)) AS BIGINT) % denom`.
    */
  def hashBucket(idCol: Column, denom: Long, salt: String = ""): Column = {
    val keyed = if (salt.isEmpty) idCol.cast("string") else concat(idCol.cast("string"), lit(salt))
    pmod(graft.plans.HashExpressions.md5Prefix60(keyed), lit(denom))
  }

  /** SOURCE-WEIGHTED MIXTURE SAMPLING: keep each row with its group's
    * rate — the "data mixing" step that turns a raw lake into a training
    * mixture (web at 0.3, books at 0.9, ...). Keep iff
    * `hashBucket(id) < round(rate(group) * denom)`; groups absent from
    * `rates` fall back to `defaultRate`. One narrow filter pass — no
    * shuffle, no driver state; rates fold into the plan as a literal CASE.
    * `salt` decorrelates independent samples drawn from the same corpus
    * (two mixtures with different salts overlap proportionally, not
    * identically).
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      denom: Long = 1000000L,
      salt: String = ""
  ): DataFrame = {
    require(denom > 0, "denom must be positive")
    (rates.values.toSeq :+ defaultRate).foreach(r => require(r >= 0.0 && r <= 1.0, s"rate $r outside [0,1]"))
    val bucket = hashBucket(col(idCol), denom, salt)
    val threshold = rates.toSeq.sortBy(_._1) match {
      case Seq() => lit(math.round(defaultRate * denom))
      case (g0, r0) +: rest =>
        rest
          .foldLeft(when(col(groupCol) === g0, lit(math.round(r0 * denom)))) { case (acc, (g, r)) =>
            acc.when(col(groupCol) === g, lit(math.round(r * denom)))
          }
          .otherwise(lit(math.round(defaultRate * denom)))
    }
    df.filter(bucket < threshold)
  }

  /** LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT: assign every row a split by
    * hashing its GROUP REPRESENTATIVE, not its own id — all members of a
    * duplicate group land in the same split, so exact duplicates can never
    * straddle train and test (the canonical eval-contamination bug).
    *
    * `groupKey` is the duplicate-group identity (e.g. `md5(text)` for
    * exact dups; a connected-component label from
    * [[Dedup.duplicateGroups]] for near-dups). The representative is the
    * group's minimum id — one window over the group key, no driver state.
    * Split thresholds are bucket counts out of `denom` (train gets
    * [0, trainBuckets), val the next `valBuckets`, test the rest).
    *
    * Scale: one shuffle on the group key (the window), then a narrow
    * hash+CASE projection. Hashing the representative (not the group key
    * itself) keeps the split decorrelated from the grouping function.
    */
  def groupSafeSplit(
      df: DataFrame,
      idCol: String,
      groupKey: Column,
      denom: Long = 10L,
      trainBuckets: Long = 8L,
      valBuckets: Long = 1L,
      salt: String = "split"
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupKey)
    val withRep = df.withColumn("rep_id", min(col(idCol)).over(w))
    splitFromRep(withRep, "rep_id", denom, trainBuckets, valBuckets, salt)
  }

  /** The split assignment itself, given an ALREADY-RESOLVED group
    * representative column (what [[groupSafeSplit]] derives with a window;
    * a near-dup pipeline passes its connected-component label instead —
    * see q126). Narrow projection, no shuffle.
    */
  def splitFromRep(
      df: DataFrame,
      repCol: String,
      denom: Long = 10L,
      trainBuckets: Long = 8L,
      valBuckets: Long = 1L,
      salt: String = "split"
  ): DataFrame = {
    require(denom > 0 && trainBuckets >= 0 && valBuckets >= 0 && trainBuckets + valBuckets <= denom,
      "splitFromRep: bucket counts must fit in denom")
    val bucket = hashBucket(col(repCol), denom, salt)
    df.withColumn(
      "split",
      when(bucket < trainBuckets, "train")
        .when(bucket < trainBuckets + valBuckets, "val")
        .otherwise("test")
    )
  }
}
