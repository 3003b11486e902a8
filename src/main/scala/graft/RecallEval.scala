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
  *
  * Round 16 adds the LABEL-SCREEN recall-vs-nprobe sweep (VERDICT r15
  * next-round #2): q196's IVF-celled screen at production nprobe values,
  * measured as flagged-row recall against the EXACT screen's flagged set
  * (of the rows the exact q156 screen flags as suspected label noise, the
  * fraction the celled screen still flags). Cells come from
  * [[Queries.q196Centroids]] — the same training as the gated query — so
  * the published curve is the committed surface's own quality dial, plus
  * one bounded audit batch (`vec_id % 400`, the production shape where the
  * probe frame is a fixed suspect list, not a corpus share).
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
    // knob points: the q41 row's claim that table count buys recall is
    // MEASURED here at the same scale point, so the serving recipe
    // ("raise tables until recall clears the bar, cost grows linearly in
    // the fused bucket pass") rests on a record. Geometry sourced from
    // Queries.Q41Lsh — the SAME constants q41 serves with (ADVICE r15:
    // a separately-encoded sweep would silently desync on a config
    // change). Since round 16 the committed config is the 16-table point.
    import org.apache.spark.sql.functions.col
    import Queries.Q41Lsh
    val emb = graft.sources.IO.table(spark, sfDir, "embeddings")
    val qvec = emb.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0)
    val knobs = Seq(8, 16, 32).map { tables =>
      val ids = graft.operators.Similarity
        .lshTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", qvec, 20,
          dim = Q41Lsh.Dim, nBits = Q41Lsh.NBits, tables = tables)
        .collect().map(_.getLong(0)).toSet
      tables -> (exact.intersect(ids).size.toDouble / exact.size)
    }
    val knobJson = knobs
      .map { case (t, r) => s""""lsh_${t}_tables":${"%.2f".format(r)}""" }
      .mkString("{", ",", "}")

    // ---- label-screen recall vs nprobe (flagged-row recall) ----
    // Baseline: the EXACT screen's flagged rows on the same probe batch.
    // A screen's job is to surface suspects, so the quality number a user
    // turning the nprobe dial needs is "of the rows the exact screen
    // flags, how many does the celled screen still flag".
    val (embQ, centroids) = Queries.q196Centroids(spark, sfDir)
    def flaggedIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("flagged")).collect().map(_.getLong(0)).toSet
    def screenRecall(probe: org.apache.spark.sql.Column, nprobe: Int, exactFlagged: Set[Long]): Double = {
      val got = flaggedIds(graft.operators.Similarity.knnLabelScreenIvf(
        embQ, "vec_id", "embedding", "label", probe, centroids, nprobe = nprobe, k = 5))
      if (exactFlagged.isEmpty) 1.0
      else exactFlagged.intersect(got).size.toDouble / exactFlagged.size
    }
    val gateProbe = col("vec_id") % 20 === 0
    val gateExact = flaggedIds(graft.operators.Similarity.knnLabelScreen(
      embQ, "vec_id", "embedding", "label", gateProbe, k = 5))
    val nprobes = Seq(1, 2, 4, centroids.size)
    val screenCurve = nprobes.map(np => np -> screenRecall(gateProbe, np, gateExact))
    // bounded audit batch — the production probe shape (fixed suspect
    // list, not a corpus share); same exact-screen baseline construction
    val smallProbe = col("vec_id") % 400 === 0
    val smallExact = flaggedIds(graft.operators.Similarity.knnLabelScreen(
      embQ, "vec_id", "embedding", "label", smallProbe, k = 5))
    val smallCurve = Seq(2).map(np => np -> screenRecall(smallProbe, np, smallExact))
    val screenJson = (
      screenCurve.map { case (np, r) =>
        val key = if (np == centroids.size) "all" else np.toString
        s""""nprobe_$key":${"%.2f".format(r)}"""
      } ++
        Seq(s""""n_flagged_exact":${gateExact.size}""") ++
        smallCurve.map { case (np, r) => s""""small_batch_nprobe_$np":${"%.2f".format(r)}""" } ++
        Seq(s""""small_batch_n_flagged_exact":${smallExact.size}""")
    ).mkString("{", ",", "}")

    val json = recalls
      .map { case (n, r) => s""""${n.split('_').head}":${"%.2f".format(r)}""" }
      .mkString("{", ",", "}")
    println(s"""[recall] {"sf":"$sfDir","k":20,"baseline":"q40","recall_at_20":$json,"lsh_table_knob":$knobJson,"label_screen_flagged_recall":$screenJson}""")
    spark.stop()
  }
}
