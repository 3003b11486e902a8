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
  * Round 16 adds the LABEL-SCREEN quality-vs-nprobe sweep (VERDICT r15
  * next-round #2): a hash-selected ~2% of labels are corrupted (planted
  * noise — the natural replica corpus flags nothing, so flagged-row
  * recall over it is vacuous), the planted rows are probed, and the
  * artifact reports the CATCH RATE (fraction of planted errors flagged)
  * for the exact screen and for q196's IVF-celled screen at nprobe
  * 1/2/4/all, plus false-flag counts on an equally-sized clean batch.
  * Cells come from [[Queries.q196Centroids]] — the same training as the
  * gated query — so the published curve is the committed surface's own
  * quality dial.
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
    import org.apache.spark.sql.functions.{col, expr, lit, pmod, when, xxhash64}
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

    // ---- label-screen quality vs nprobe (planted-noise catch rate) ----
    // The natural ScaleGen corpus flags ZERO rows through the exact screen
    // (replicas carry consistent labels, so every probe's neighbors agree
    // with it) — a flagged-row recall over that set is vacuous. The
    // measurement VERDICT r15 #2 actually asks for — "how many mislabeled
    // rows the screen still catches at production nprobe" — needs planted
    // noise: corrupt a hash-selected ~2% of labels (hash, not modulo —
    // ScaleGen replica ids are congruent mod powers of ten, so a modulo
    // plant corrupts whole replica FAMILIES whose members then vote for
    // each other's wrong label and hide), probe exactly the planted rows,
    // and report the fraction flagged (catch rate) per nprobe, plus the
    // false-flag count on a clean batch of the same construction.
    val (embQ, centroids) = Queries.q196Centroids(spark, sfDir)
    val planted = pmod(xxhash64(col("vec_id")), lit(50)) === 7
    val cleanBatch = pmod(xxhash64(col("vec_id")), lit(50)) === 3
    val corrupted = embQ.withColumn(
      "label", when(planted, col("label") + 100).otherwise(col("label")))
    def flaggedCount(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = df.select(col("flagged")).collect()
      (rows.count(_.getBoolean(0)).toLong, rows.length.toLong)
    }
    def catchRate(probe: org.apache.spark.sql.Column, nprobe: Option[Int]): (Double, Long, Long) = {
      val out = nprobe match {
        case None => graft.operators.Similarity.knnLabelScreen(
          corrupted, "vec_id", "embedding", "label", probe, k = 5)
        case Some(np) => graft.operators.Similarity.knnLabelScreenIvf(
          corrupted, "vec_id", "embedding", "label", probe, centroids, nprobe = np, k = 5)
      }
      val (caught, total) = flaggedCount(out)
      // ADVICE r16: an empty probe set must fail loudly, not publish a
      // vacuously-perfect catch rate (a scale point where the hash plants
      // zero rows would otherwise report 1.00 with n_planted_probes=0)
      require(total > 0, "catchRate: probe predicate selected zero rows — the published rate would be vacuous")
      (caught.toDouble / total, caught, total)
    }
    val (exactRate, exactCaught, nPlanted) = catchRate(planted, None)
    val screenCurve = Seq(1, 2, 4, centroids.size).map { np =>
      val key = if (np == centroids.size) "all" else np.toString
      key -> catchRate(planted, Some(np))._1
    }
    val (_, falseFlagsExact, nClean) = catchRate(cleanBatch, None)
    val (_, falseFlags2, _) = catchRate(cleanBatch, Some(2))

    // ---- perturbed-vector plant: the curve that can bend (VERDICT r16
    // #5). The identical-replica plant above cannot distinguish nprobe=1
    // from exact BY CONSTRUCTION (a planted row's disagreeing evidence —
    // its replicas — co-locates in its own first-probed cell), and its
    // +100 corruption makes a miss impossible for ANY candidate set (no
    // clean row carries the corrupted label, so any neighbor majority
    // disagrees). This block removes both outs: (a) the planted row's
    // VECTOR gets deterministic hash-derived jitter, so the probe's cell
    // is computed from the jittered vector while its replica family keeps
    // the original one — at small nprobe the family can fall outside the
    // probed cells; (b) the label corrupts INTO AN EXISTING CLASS
    // ((label+1) mod 10), so a probe whose candidate cells happen to hold
    // a majority of that class is genuinely MISSED. Alongside the catch
    // rate, `evidence_recall` = fraction of planted probes whose majority
    // neighbor label is the TRUE label — i.e. the replica family (or
    // like-labeled evidence) was found and won the vote — the direct
    // measure of what the nprobe dial trades.
    val jitterAmp = 0.10 // ~ the corpus's per-dim mean |v|: enough to move cells, small vs the family cosine
    val jittered = expr(
      s"""transform(embedding, (v, i) ->
         |  CAST(v + $jitterAmp * ((pmod(xxhash64(vec_id, i), 2001) - 1000) / 1000.0) AS FLOAT))""".stripMargin)
    val perturbed = embQ
      .withColumn("embedding", when(planted, jittered).otherwise(col("embedding")))
      .withColumn("label", when(planted, pmod(col("label") + 1, lit(10))).otherwise(col("label")))
    def screenStats(nprobe: Option[Int]): (Double, Double, Long) = {
      val out = nprobe match {
        case None => graft.operators.Similarity.knnLabelScreen(
          perturbed, "vec_id", "embedding", "label", planted, k = 5)
        case Some(np) => graft.operators.Similarity.knnLabelScreenIvf(
          perturbed, "vec_id", "embedding", "label", planted, centroids, nprobe = np, k = 5)
      }
      // join back the TRUE label (the pre-corruption one) for evidence_recall
      val withTruth = out.join(
        embQ.select(col("vec_id"), col("label").as("true_label")), Seq("vec_id"))
      val rows = withTruth.select(col("flagged"), col("neighbor_label"), col("true_label")).collect()
      require(rows.nonEmpty, "perturbed plant selected zero rows")
      val caught = rows.count(_.getBoolean(0)).toDouble / rows.length
      val evid = rows.count(r => r.getLong(1) == r.getInt(2).toLong).toDouble / rows.length
      (caught, evid, rows.length.toLong)
    }
    val (exCatch, exEvid, nPerturbed) = screenStats(None)
    val perturbedCurve = Seq(1, 2, 4, centroids.size).map { np =>
      val key = if (np == centroids.size) "all" else np.toString
      val (c, e, _) = screenStats(Some(np))
      key -> ((c, e))
    }
    val perturbedJson = (
      Seq(
        s""""jitter_amp":$jitterAmp""",
        s""""n_perturbed_probes":$nPerturbed""",
        s""""exact_catch_rate":${"%.3f".format(exCatch)}""",
        s""""exact_evidence_recall":${"%.3f".format(exEvid)}""") ++
        perturbedCurve.flatMap { case (key, (c, e)) => Seq(
          s""""nprobe_${key}_catch_rate":${"%.3f".format(c)}""",
          s""""nprobe_${key}_evidence_recall":${"%.3f".format(e)}""") }
    ).mkString("{", ",", "}")

    // ---- PQ shortlist depth per code size (VERDICT r16 #7): the
    // "coarser codes need deeper shortlists" note, measured. Same
    // training chain as the committed q197 surface (Queries.q197PqSetup —
    // single-homed geometry), the subspace count m the one knob:
    // m=4 → 16-bit codes (coarsest), m=8 → the committed 32-bit point,
    // m=16 → 64-bit codes (finest). Recall@20 vs q40's exact ranking at
    // shortlist depths 100/200/500/1000.
    val pqJson = Seq(4, 8, 16).map { m =>
      val (embP, cbs, qv) = Queries.q197PqSetup(spark, sfDir, m)
      val corpus = embP.filter(col("vec_id") =!= 0)
      val depths = Seq(100, 200, 500, 1000).map { sl =>
        val ids = graft.operators.Similarity
          .pqAdcRerankTopK(corpus, "vec_id", "embedding", 64, cbs, qv, k = 20, shortlist = sl)
          .collect().map(_.getLong(0)).toSet
        s""""sl$sl":${"%.2f".format(exact.intersect(ids).size.toDouble / exact.size)}"""
      }
      s""""m$m":${depths.mkString("{", ",", "}")}"""
    }.mkString("{", ",", "}")
    val screenJson = (
      Seq(
        s""""planted_frac":0.02""",
        s""""n_planted_probes":$nPlanted""",
        s""""exact_catch_rate":${"%.2f".format(exactRate)}""",
        s""""exact_caught":$exactCaught""") ++
        screenCurve.map { case (key, r) => s""""nprobe_${key}_catch_rate":${"%.2f".format(r)}""" } ++
        Seq(
          s""""clean_batch_probes":$nClean""",
          s""""clean_batch_false_flags_exact":$falseFlagsExact""",
          s""""clean_batch_false_flags_nprobe_2":$falseFlags2""")
    ).mkString("{", ",", "}")

    val json = recalls
      .map { case (n, r) => s""""${n.split('_').head}":${"%.2f".format(r)}""" }
      .mkString("{", ",", "}")
    println(s"""[recall] {"sf":"$sfDir","k":20,"baseline":"q40","recall_at_20":$json,"lsh_table_knob":$knobJson,"label_screen_planted_noise":$screenJson,"label_screen_perturbed_plant":$perturbedJson,"pq_shortlist_by_code_size":$pqJson}""")
    spark.stop()
  }
}
