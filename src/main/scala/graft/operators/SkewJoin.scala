package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for joins whose key distribution defeats AQE.
  *
  * AQE's skew-join splitting (enabled in [[graft.core.Sessions]]) handles
  * most cases at runtime; salting is the explicit tool for EXTREME skew — a
  * handful of keys holding a double-digit percentage of a 100 TB table,
  * where even split sub-partitions of one key overwhelm single tasks paired
  * with a large build side.
  *
  * Mechanics: the big side gets a uniform salt in [0, n); the small side is
  * replicated n times (one copy per salt value); the join key becomes
  * (key, salt). Join results are identical to the unsalted join for
  * inner/left-semi/left-outer-on-big joins — every big-side row still meets
  * every matching small-side row exactly once.
  */
object SkewJoin {

  /** Inner equi-join with an n-way salt on the small side.
    *
    * The salt is derived from a hash of the big side's whole row id stream
    * (spark_partition_id + a per-partition counter via
    * monotonically_increasing_id) — uniform and cheap; correctness does not
    * depend on which salt a row gets, only that the small side covers all n.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val bigS = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)).cast("int"))
    val smallS = small.withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Skewed-aggregation two-phase combine: pre-aggregate on (key, salt),
    * then merge partials on key. Use when one group key dominates and the
    * map-side partial aggregation alone can't contain it.
    */
  def twoPhaseCount(df: DataFrame, key: String, nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
