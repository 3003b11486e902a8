package graft

/** ANN serving-path RECALL evaluation (VERDICT r14 #4): every approximate
  * top-20 query in the family, measured as recall@20 against q40's exact
  * brute-force ranking at the same scale point — so each serving-layout
  * row in SCALE.md carries (latency, recall) from the SAME data. Not part
  * of the driver contract; emits one `[recall]` JSON line, committed as
  * RECALL_<sf>.json next to the SCALE.md table.
  *
  * Recall@20 = |ann_ids ∩ exact_ids| / 20 on the first output column
  * (vec_id) — every family member queries vec_id 0's vector with k=20 and
  * self excluded, so the id sets are directly comparable.
  */
object RecallEval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = graft.core.Sessions.local(cpus, "graft-recall")

    def topIds(name: String): Set[Long] =
      SparkEntry.queries(name)(spark, sfDir).collect().map(_.getLong(0)).toSet

    val exact = topIds("q40_ann_bruteforce")
    require(exact.size == 20, s"exact baseline returned ${exact.size} ids, expected 20")
    val family = Seq(
      "q41_ann_lsh", "q72_ann_ivf", "q85_ann_ivf_trained", "q90_ann_ivf_sampled",
      "q96_ann_sq8", "q114_ann_pq", "q115_ann_ivf_pq", "q161_pq_index_probe",
      "q163_ann_ivf_pq_residual", "q197_ann_pq_rerank")
    val recalls = family.map { n =>
      val ids = topIds(n)
      n -> (exact.intersect(ids).size.toDouble / exact.size)
    }
    // knob points (eval-only — q41's committed config stays the
    // oracle-gated 8×5 surface): the q41 row's claim that table count
    // buys recall is MEASURED here at the same scale point, so the
    // serving recipe ("raise tables until recall clears the bar, cost
    // grows linearly in the fused bucket pass") rests on a record
    import org.apache.spark.sql.functions.{col, floor => ffloor}
    val emb = graft.sources.IO.table(spark, sfDir, "embeddings")
    val qvec = emb.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0)
    val knobs = Seq(8, 16, 32).map { tables =>
      val ids = graft.operators.Similarity
        .lshTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", qvec, 20, tables = tables)
        .collect().map(_.getLong(0)).toSet
      tables -> (exact.intersect(ids).size.toDouble / exact.size)
    }
    val knobJson = knobs
      .map { case (t, r) => s""""lsh_${t}_tables":${"%.2f".format(r)}""" }
      .mkString("{", ",", "}")

    val json = recalls
      .map { case (n, r) => s""""${n.split('_').head}":${"%.2f".format(r)}""" }
      .mkString("{", ",", "}")
    println(s"""[recall] {"sf":"$sfDir","k":20,"baseline":"q40","recall_at_20":$json,"lsh_table_knob":$knobJson}""")
    spark.stop()
  }
}
