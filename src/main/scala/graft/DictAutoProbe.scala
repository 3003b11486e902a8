package graft

/** Prints [[graft.operators.Dedup.DictHint.Auto]]'s decision inputs for the
  * q135 (jaccardPairsPrefix) and q37 (minhashLsh, portable) stages on a
  * given corpus — one JSON line per stage. These are the measured facts
  * the calibrated default `MinPayloadRatio` rests on: the r16 A/B showed
  * the un-hinted verify WINS at sf1 and DNFs at sf3, so the default must
  * sit between the two corpora's payload ratios (SCALE.md r17 ledger).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.DictAutoProbe"
  */
object DictAutoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-dict-auto-probe")
    val docs = graft.sources.IO.table(spark, sfDir, "documents")
    def emit(stage: String, s: (Long, Double, Double, Long, Double)): Unit =
      println(
        s"""[dict-auto] {"sf":"$sfDir","stage":"$stage","dict_rows":${s._1},""" +
          f""""avg_set_len":${s._2}%.1f,"dict_mb":${s._3 / 1e6}%.1f,""" +
          s""""est_candidates":${s._4},${f""""payload_ratio":${s._5}%.1f"""}}""")
    emit("q135_jaccard_prefix",
      graft.operators.Dedup.autoStatsJaccardPrefix(docs, "doc_id", "text", 2L, 5L, shingleSize = 3))
    emit("q37_minhash_lsh",
      graft.operators.Dedup.autoStatsMinhashLsh(docs, "doc_id", "text",
        shingleSize = 3, bands = 8, rowsPerBand = 2, portable = true))
    spark.stop()
  }
}
