package graft

/** Per-query shuffle-WRITE budgets in MB at sf0.1 — the
  * contention-immune regression pins Bench checks on every driver run.
  * Bytes shuffled are a function of plan + data alone (verified: two
  * full sf0.1 sweeps in round 12 agreed byte-for-byte on all 119
  * queries), so unlike the time pins these need no floor
  * normalization: a breach means the PLAN regressed — an exchange
  * appeared, partial aggregation stopped combining, a broadcast fell
  * back to shuffle — never that the host was busy.
  *
  * Budgets are 1.3× the round-12 idle sf0.1 full-sweep reading with a
  * 0.5 MB absolute floor. Every query is pinned: sub-floor queries
  * (most of them — the library keeps shuffles map-side-combined or
  * broadcast) get the floor, which still catches the class that
  * matters, a near-zero-shuffle plan growing a real exchange. The
  * 1.3× headroom clears AQE partition-count jitter while catching the
  * ≥2× jumps every real plan regression to date produced (the r10
  * nullable-bucket-key defect, the r10 un-pinned dropIds lineage that
  * took the ×16 capstone 913 → 2587 MB).
  *
  * Re-baseline deliberately, in the same commit as an intended plan
  * change. Only checked for sf0.1 under the full sweep at the default
  * 32 CPUs: leaf split planning — and with it map-side-combine
  * output — is parallelism-dependent.
  */
object ShuffleBudgets {
  val mbAtSf01: Map[String, Double] = Map(
    "q_agg_corr" -> 0.5,
    "q_agg_distinct_count" -> 0.5,
    "q_agg_group" -> 0.5,
    "q_agg_median" -> 0.5,
    "q_agg_minmax" -> 0.5,
    "q_agg_moments" -> 0.5,
    "q_ann_topk" -> 0.5,
    "q_approx_distinct" -> 0.5,
    "q_arg_extrema" -> 0.5,
    "q_array_ops" -> 0.5,
    "q_array_stats" -> 0.5,
    "q_array_zip" -> 0.5,
    "q_asof_forward" -> 0.5,
    "q_asof_join" -> 0.5,
    "q_bigram_lm" -> 0.98,
    "q_bitwise_agg" -> 0.5,
    "q_bloom_prune_join" -> 0.5,
    "q_bm25" -> 0.5,
    "q_boilerplate_spans" -> 5.535,
    "q_bpe_pairs" -> 0.5,
    "q_case_when" -> 0.5,
    "q_cdc_apply" -> 1.035,
    "q_chunk_windows" -> 0.5,
    "q_cohort_retention" -> 1.504,
    "q_conditional_agg" -> 0.5,
    "q_cube" -> 0.5,
    "q_date_arith" -> 0.5,
    "q_date_funcs" -> 0.5,
    "q_date_spine" -> 0.5,
    "q_decontaminate" -> 1.017,
    "q_dedup_embed_lsh" -> 0.5,
    "q_dedup_embed_topk" -> 0.5,
    "q_dedup_exact" -> 0.5,
    "q_dedup_minhash_lsh" -> 0.5,
    "q_dedup_ngram_jaccard" -> 0.5,
    "q_dedup_simhash" -> 0.5,
    "q_dedup_simhash_ham" -> 0.5,
    "q_distinct_project" -> 0.5,
    "q_doc_entropy" -> 0.734,
    "q_drawdown" -> 0.5,
    "q_dup_groups" -> 0.5,
    "q_embed_label_topk" -> 2.101,
    "q_embed_quantize" -> 0.5,
    "q_except" -> 0.5,
    "q_expectations" -> 0.5,
    "q_filter_range" -> 0.5,
    "q_funnel" -> 0.5,
    "q_gap_islands" -> 1.752,
    "q_grouping_id" -> 0.5,
    "q_heavy_hitters" -> 0.5,
    "q_hist" -> 0.5,
    "q_incremental_rollup" -> 0.5,
    "q_intersect" -> 0.5,
    "q_interval_join" -> 0.5,
    "q_ivf_recall" -> 0.5,
    "q_join_anti" -> 0.5,
    "q_join_broadcast_const" -> 0.5,
    "q_join_full_outer" -> 0.5,
    "q_join_hashkey" -> 0.5,
    "q_join_inner_equi" -> 0.5,
    "q_join_left_year" -> 0.5,
    "q_join_semi" -> 0.5,
    "q_json_extract" -> 0.5,
    "q_map_ops" -> 0.5,
    "q_md5_key" -> 0.5,
    "q_minhash_est" -> 0.5,
    "q_mix_epochs" -> 0.5,
    "q_mode" -> 0.5,
    "q_null_semantics" -> 0.5,
    "q_outlier_p95" -> 0.5,
    "q_pack_sequences" -> 0.5,
    "q_percentile_disc" -> 0.5,
    "q_pivot" -> 0.5,
    "q_profile" -> 0.5,
    "q_quality_gates" -> 0.5,
    "q_quantile_sketch_band" -> 0.5,
    "q_quantiles_multi" -> 0.5,
    "q_regex_extract" -> 0.5,
    "q_repeat_tokens" -> 0.5,
    "q_rollup" -> 0.5,
    "q_rsi" -> 19.417,
    "q_salt_skew_agg" -> 0.5,
    "q_salt_skew_join" -> 0.5,
    "q_sample_stratified" -> 0.5,
    "q_scan_project" -> 0.5,
    "q_scd2_asof" -> 1.278,
    "q_scrub_pii" -> 0.5,
    "q_session_window" -> 2.799,
    "q_sessionize" -> 2.752,
    "q_similarity_cosine" -> 0.5,
    "q_sort_limit" -> 0.5,
    "q_sql_grouping_sets" -> 0.5,
    "q_string_agg" -> 0.5,
    "q_string_funcs" -> 0.5,
    "q_text_edit_distance" -> 0.5,
    "q_text_fingerprint" -> 0.5,
    "q_text_langid" -> 0.5,
    "q_text_quality" -> 0.5,
    "q_text_rolling_hash" -> 0.5,
    "q_text_token_count" -> 0.5,
    "q_text_tokens" -> 0.5,
    "q_tfidf_top" -> 1.309,
    "q_time_bucket" -> 0.5,
    "q_token_df" -> 0.5,
    "q_top_bigram" -> 0.98,
    "q_topk_agg" -> 0.5,
    "q_train_split" -> 0.5,
    "q_try_semantics" -> 0.5,
    "q_union_distinct" -> 0.5,
    "q_unpivot" -> 0.5,
    "q_window_cume" -> 0.5,
    "q_window_dense_rank" -> 0.5,
    "q_window_lag_return" -> 0.5,
    "q_window_lead_ntile" -> 0.5,
    "q_window_range_frame" -> 0.5,
    "q_window_rank_topk" -> 0.5,
    "q_window_rolling_std" -> 0.5,
    "q_window_sliding" -> 0.588,
    "q_window_tumbling" -> 0.872)
}
