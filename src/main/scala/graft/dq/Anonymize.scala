package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-ANONYMITY by full-domain generalization (Samarati/Sweeney): publish
  * a table whose quasi-identifier combination always matches at least k
  * rows, by generalizing every row with the SAME (global) ladder level —
  * the least-general level whose smallest group reaches k.
  *
  * Full-domain (uniform-level) recoding is chosen deliberately over
  * data-dependent partitioners (Mondrian et al.): the output is a pure
  * function of the ladder and the data, so it is bit-reproducible,
  * SQL-replayable (q186's oracle re-derives level choice AND output), and
  * auditable — a reviewer can verify the privacy property from the
  * published table alone.
  *
  * SCALE: level selection is at most `ladder.size` map-side-combinable
  * aggregations (tiny group-count frames, no row data moves), and the
  * final publish is one projection plus one window for the per-group
  * size witness. Ladders are small constants; corpus cost is O(levels)
  * scans.
  */
object Anonymize {

  /** One generalization level: named expressions for every quasi column. */
  type Level = Seq[(String, Column)]

  /** Smallest ladder index whose minimum quasi-group size reaches k
    * (ladder.size - 1, the coarsest, as fallback). Exposed for tests.
    */
  def chooseLevel(df: DataFrame, k: Long, ladder: Seq[Level]): Int = {
    require(ladder.nonEmpty, "generalization ladder must have at least one level")
    val found = ladder.indexWhere { lv =>
      val grouped = df.groupBy(lv.map { case (n, c) => c.as(n) }: _*).count()
      // empty input: min over zero groups is null — does not qualify
      val m = grouped.agg(min(col("count"))).head()
      !m.isNullAt(0) && m.getLong(0) >= k
    }
    if (found < 0) ladder.size - 1 else found
  }

  /** Publish `df` k-anonymized: key columns pass through, quasi columns
    * are generalized at the chosen level, and each row carries the level
    * plus its group size as the verifiable privacy witness.
    *
    * FAILS CLOSED: when even the coarsest level cannot reach k (a table
    * smaller than k, or an unreachable ladder), rows in under-k groups
    * are SUPPRESSED rather than published — the classic suppression step
    * that keeps the stated invariant unconditional. At any level
    * [[chooseLevel]] actually qualified, suppression is a no-op.
    */
  def kAnonymize(df: DataFrame, k: Long, keyCols: Seq[String], ladder: Seq[Level]): DataFrame = {
    val lvl = chooseLevel(df, k, ladder)
    val gen = df.select(keyCols.map(col) ++ ladder(lvl).map { case (n, c) => c.as(n) }: _*)
    val quasi = ladder(lvl).map { case (n, _) => col(n) }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(quasi: _*)
    gen
      .withColumn("gen_level", lit(lvl))
      .withColumn("group_n", count(lit(1)).over(w))
      .filter(col("group_n") >= k) // suppression: every published row provably meets k
  }
}
