package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + COVERAGE.md for the
  * operator-to-query mapping.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the LLM-pipeline
    * operator set). Every entry has a DuckDB oracle in [[Oracles.all]] —
    * including the sketch/LSH queries (q37/q38/q41/q44 replicate the banding
    * and hash families in SQL; q63 emits exact stats + deterministic
    * bound-check booleans the oracle recomputes).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01 _),
    "q02_filter_pushdown" -> (Queries.q02 _),
    "q03_join_revenue" -> (Queries.q03 _),
    "q04_semi_join" -> (Queries.q04 _),
    "q05_anti_join" -> (Queries.q05 _),
    "q06_dim_rollup" -> (Queries.q06 _),
    "q07_window_latest" -> (Queries.q07 _),
    "q08_distinct" -> (Queries.q08 _),
    "q09_in_list" -> (Queries.q09 _),
    "q10_null_sentinel" -> (Queries.q10 _),
    "q11_scd2_upsert" -> (Queries.q11 _),
    "q12_state_delta" -> (Queries.q12 _),
    "q13_explode_tokens" -> (Queries.q13 _),
    "q14_first_element" -> (Queries.q14 _),
    "q15_json_extract" -> (Queries.q15 _),
    "q16_float_to_long" -> (Queries.q16 _),
    "q17_year_filter" -> (Queries.q17 _),
    "q18_date_parts" -> (Queries.q18 _),
    "q19_mask_hash" -> (Queries.q19 _),
    "q20_scd2_two_key" -> (Queries.q20 _),
    "q21_dq_suite" -> (Queries.q21 _),
    "q22_unique_check" -> (Queries.q22 _),
    "q23_rollup" -> (Queries.q23 _),
    "q24_sessions" -> (Queries.q24 _),
    "q26_distinct_profile" -> (Queries.q26 _),
    "q27_pivot" -> (Queries.q27 _),
    "q50_multi_join" -> (Queries.q50 _),
    "q51_conditional_agg" -> (Queries.q51 _),
    "q52_like_filter" -> (Queries.q52 _),
    "q53_date_arith" -> (Queries.q53 _),
    "q54_correlated_avg" -> (Queries.q54 _),
    "q55_union_distinct" -> (Queries.q55 _),
    "q56_exists_combo" -> (Queries.q56 _),
    "q57_string_funcs" -> (Queries.q57 _),
    "q58_min_by_group" -> (Queries.q58 _),
    "q30_dedup_exact" -> (Queries.q30 _),
    "q31_text_tokens" -> (Queries.q31 _),
    "q32_text_quality" -> (Queries.q32 _),
    "q33_lang_id" -> (Queries.q33 _),
    "q34_rolling_fingerprint" -> (Queries.q34 _),
    "q35_minhash_signature" -> (Queries.q35 _),
    "q36_jaccard_pairs" -> (Queries.q36 _),
    "q39_simhash_portable" -> (Queries.q39 _),
    "q37_minhash_lsh" -> (Queries.q37 _),
    "q38_simhash" -> (Queries.q38 _),
    "q40_ann_bruteforce" -> (Queries.q40 _),
    "q41_ann_lsh" -> (Queries.q41 _),
    "q42_multimodal_meta" -> (Queries.q42 _),
    "q43_event_windows" -> (Queries.q43 _),
    "q45_stream_windows" -> (Queries.q45 _),
    "q46_lsh_buckets" -> (Queries.q46 _),
    "q47_embedding_neardup" -> (Queries.q47 _),
    "q48_profile" -> (Queries.q48 _),
    "q49_asof_join" -> (Queries.q49 _),
    "q60_repetition" -> (Queries.q60 _),
    "q61_vocab" -> (Queries.q61 _),
    "q62_stratified_sample" -> (Queries.q62 _),
    "q63_approx_stats" -> (Queries.q63 _),
    "q65_simhash_neardup" -> (Queries.q65 _),
    "q66_pii_redact" -> (Queries.q66 _),
    "q67_unicode_canon" -> (Queries.q67 _),
    "q68_quality_filter" -> (Queries.q68 _),
    "q64_tfidf" -> (Queries.q64 _),
    "q44_media_decode" -> (Queries.q44 _),
    "q70_pipeline_golden" -> (Queries.q70 _),
    "q71_report_ingest" -> (Queries.q71 _),
    "q72_ann_ivf" -> (Queries.q72 _),
    "q85_ann_ivf_trained" -> (Queries.q85 _),
    "q86_semantic_dedup" -> (Queries.q86 _),
    "q87_mixture_sample" -> (Queries.q87 _),
    "q88_dup_groups" -> (Queries.q88 _),
    "q89_gopher_gates" -> (Queries.q89 _),
    "q90_ann_ivf_sampled" -> (Queries.q90 _),
    "q91_image_decode" -> (Queries.q91 _),
    "q92_hot_spans" -> (Queries.q92 _),
    "q93_url_screen" -> (Queries.q93 _),
    "q94_audio_decode" -> (Queries.q94 _),
    "q95_video_meta" -> (Queries.q95 _),
    "q96_ann_sq8" -> (Queries.q96 _),
    "q97_corpus_pipeline" -> (Queries.q97 _),
    "q98_ann_ivf_sq8" -> (Queries.q98 _),
    "q99_bpe_tokens" -> (Queries.q99 _),
    "q100_lm_perplexity" -> (Queries.q100 _),
    "q101_seq_packing" -> (Queries.q101 _),
    "q102_stream_dedup" -> (Queries.q102 _),
    "q103_bm25_topk" -> (Queries.q103 _),
    "q104_stream_interval_join" -> (Queries.q104 _),
    "q105_substring_dedup" -> (Queries.q105 _),
    "q106_change_feed" -> (Queries.q106 _),
    "q107_hybrid_rrf" -> (Queries.q107 _),
    "q108_recipe_substring" -> (Queries.q108 _),
    "q109_bm25_batch" -> (Queries.q109 _),
    "q110_video_frames" -> (Queries.q110 _),
    "q111_stream_enrich" -> (Queries.q111 _),
    "q112_fuzzy_match" -> (Queries.q112 _),
    "q113_heavy_hitters" -> (Queries.q113 _),
    "q114_ann_pq" -> (Queries.q114 _),
    "q115_ann_ivf_pq" -> (Queries.q115 _),
    "q73_group_minhash" -> (Queries.q73 _),
    "q74_stream_sessions" -> (Queries.q74 _),
    "q75_crypto_roundtrip" -> (Queries.q75 _),
    "q76_salted_join" -> (Queries.q76 _),
    "q77_paged_ingest" -> (Queries.q77 _),
    "q78_decontamination" -> (Queries.q78 _),
    "q79_stream_delta" -> (Queries.q79 _),
    "q80_scd2_partitioned" -> (Queries.q80 _),
    "q81_chunking" -> (Queries.q81 _),
    "q82_returned_items" -> (Queries.q82 _),
    "q83_volume_shipping" -> (Queries.q83 _),
    "q84_disjunctive_pred" -> (Queries.q84 _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. As of round 3 every query key has an oracle entry.
    */
  def oracleSql: Map[String, String] = Oracles.all
}
