package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label aggregation for annotation pipelines (RLHF preference data,
  * classifier training sets): collapse multi-annotator votes into one
  * label per item, and audit the annotators against the consensus —
  * the deterministic core of Dawid-Skene-style quality control (the
  * EM refinement weights annotators by these same agreement rates).
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

  /** Per-annotator audit against the consensus: (annotator, n_votes,
    * n_agree, agree_e4) — the reliability weights a Dawid-Skene
    * refinement (or a simple annotator screen) starts from.
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
