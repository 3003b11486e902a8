package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label aggregation for annotation pipelines (RLHF preference data,
  * classifier training sets): collapse multi-annotator votes into one
  * label per item, audit the annotators against the consensus, and run
  * the Dawid-Skene-style EM refinement ([[dawidSkene]]) that
  * re-weights votes by per-annotator confusion and re-labels items.
  *
  * Determinism rule: ties break to the lexicographically smallest label
  * among the tied counts, so the consensus is a pure function of the
  * vote multiset and replays identically in SQL.
  *
  * SCALE: one (item, label) count aggregation (map-side partial), one
  * per-item window over the tiny counts frame, and — for the audit —
  * one join of votes to consensus on the item key. Vote rows move once.
  */
object Labels {

  /** Per-item consensus: (item, maj_label, maj_votes, n_votes,
    * agreement_e4). `agreement_e4` = majority share, floor-scaled.
    */
  def majorityVote(votes: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val counts = votes
      .groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(itemCol))
      .orderBy(col("__cnt").desc, col(labelCol).asc)
    counts
      .withColumn("__rn", row_number().over(w))
      .withColumn("__total", sum(col("__cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy(col(itemCol))))
      .filter(col("__rn") === 1)
      .select(
        col(itemCol),
        col(labelCol).as("maj_label"),
        col("__cnt").as("maj_votes"),
        col("__total").as("n_votes"),
        expr("(__cnt * 10000L) div __total").as("agreement_e4")
      )
  }

  /** Dawid-Skene-style EM label refinement — the hard-EM
    * (classification) variant with per-(annotator, observed-label)
    * precision weights, i.e. the observed-direction DIAGONAL of each
    * annotator's confusion matrix, rather than the full soft-posterior
    * model:
    *
    *  - M-step: `w(a, l) = floor(1e4 * P(consensus = l | a voted l))`
    *    against the CURRENT consensus — integer e4, floor division.
    *  - E-step: each item re-labels to the vote-weighted argmax
    *    `argmax_l sum(w(a, l) for a voting l)`, ties to the
    *    lexicographically smallest label (same rule as [[majorityVote]]).
    *
    * Seeded from the majority consensus; `iters` fixed M/E rounds. Why
    * per-label weights matter: a systematic error class (every erring
    * annotator emitting the same junk label) survives SCALAR reliability
    * weighting — the heaviest erring coalition still outweighs the
    * honest minority — but its junk-label precision collapses toward 0
    * because the consensus almost never agrees with those votes, so the
    * weighted argmax flips the item back to the label the reliable
    * annotators gave. Everything is integer arithmetic with
    * deterministic tie-breaks: the whole refinement replays
    * bit-identically in SQL (the q194 oracle unrolls both rounds).
    *
    * Output: (item, maj_label, ds_label, ds_score_e4, n_votes) — the
    * majority seed kept alongside the refined label so a caller (and
    * the spec) can measure what the refinement changed.
    *
    * SCALE: per round, vote rows move twice — one shuffle on the item
    * key (consensus join), one map-side-combined agg per
    * (annotator, label) whose result is TINY (annotators × labels) and
    * re-enters broadcast; the E-step agg shuffles on (item, label) and
    * the argmax window partitions by item. With iters=2 that is a
    * fixed, small constant of passes; callers looping more rounds over
    * a huge vote table should persist `votes` first.
    */
  def dawidSkene(
      votes: DataFrame,
      itemCol: String,
      annotatorCol: String,
      labelCol: String,
      iters: Int = 2
  ): DataFrame = {
    require(iters >= 1, s"dawidSkene needs at least one M/E round, got $iters")
    val v = votes.select(col(itemCol), col(annotatorCol), col(labelCol))
    def argmax(scored: DataFrame, scoreCol: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(itemCol))
        .orderBy(col(scoreCol).desc, col(labelCol).asc)
      scored
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(itemCol), col(labelCol).as("__cons"), col(scoreCol).cast("long").as("__score"))
    }
    var cons = majorityVote(v, itemCol, labelCol)
      .select(col(itemCol), col("maj_label").as("__cons"), lit(0L).as("__score"))
    for (_ <- 1 to iters) {
      val w = v
        .join(cons.select(col(itemCol), col("__cons")), Seq(itemCol))
        .groupBy(col(annotatorCol), col(labelCol))
        .agg(
          count(lit(1)).as("__n"),
          sum(when(col(labelCol) === col("__cons"), 1L).otherwise(0L)).as("__ok"))
        .select(col(annotatorCol), col(labelCol), expr("(__ok * 10000L) div __n").as("__w"))
      val scored = v
        .join(broadcast(w), Seq(annotatorCol, labelCol))
        .groupBy(col(itemCol), col(labelCol))
        .agg(sum(col("__w")).as("__s"))
      cons = argmax(scored, "__s")
    }
    majorityVote(v, itemCol, labelCol)
      .join(cons, Seq(itemCol))
      .select(
        col(itemCol),
        col("maj_label"),
        col("__cons").as("ds_label"),
        col("__score").as("ds_score_e4"),
        col("n_votes"))
  }

  /** Per-annotator audit against the consensus: (annotator, n_votes,
    * n_agree, agree_e4) — the reliability weights a Dawid-Skene
    * refinement ([[dawidSkene]]) starts from.
    */
  def annotatorAgreement(votes: DataFrame, itemCol: String, annotatorCol: String, labelCol: String): DataFrame = {
    val consensus = majorityVote(votes, itemCol, labelCol).select(col(itemCol), col("maj_label"))
    votes
      .join(consensus, itemCol)
      .groupBy(col(annotatorCol))
      .agg(
        count(lit(1)).as("n_votes"),
        sum(when(col(labelCol) === col("maj_label"), 1L).otherwise(0L)).as("n_agree")
      )
      .withColumn("agree_e4", expr("(n_agree * 10000L) div n_votes"))
  }
}
