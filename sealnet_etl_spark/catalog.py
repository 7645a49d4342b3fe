"""Import every query module so registry registration runs, then order the
registry for the driver's grading pass.

Add one import line per module as operators land (SURVEY.md §7.3 order).

Grading order: the round-1 driver graded exactly the first 50 registry
entries (CORRECTNESS_r01.json stops mid-`joins`, in registration order),
leaving 73 queries without a correctness row. The registry is therefore
re-ordered after import so the grading window covers what needs evidence
most:

1. the three round-2 driver-red queries (TIMESTAMP_NTZ), now fixed
   (regrade proves the fix);
2. everything never graded in r1 or r2 — streaming replays, the UDF
   surface, textstats/multimodal, then the round-2 flagship plans;
3. the 94 queries the r1/r2 drivers already verified green.

Correctness of every tier is still enforced locally each round by the
strict mirror (tests/test_oracle_mirror.py runs ALL queries); the ordering
only controls which queries the driver's bounded window re-proves.
"""

from .functions import families  # noqa: F401
from .operators import (  # noqa: F401
    aggregates,
    dedup,
    etl,
    joins,
    multimodal,
    projections,
    similarity,
    sorts_sets,
    textstats,
    trainprep,
    udfs,
    windows,
)
from .sources import ingest  # noqa: F401
from .streaming import incremental, queries_str  # noqa: F401
from .plans import flagship  # noqa: F401

from . import registry as _registry

#: Operators CHANGED in round 4 — graded first to prove the fixes with a
#: fresh driver row (VERDICT r3 "Next round" #1-#3 + ADVICE r3 high):
#: the inference rounding fix, the (day,hour) interval blocking, and the
#: two queries whose rows-only checks were upgraded to hash oracles.
_REGRADE_FIRST: tuple[str, ...] = (
    "udf_model_batch_inference",
    "jn_interval_overlap",
    "llm_simhash_near_dup",
    "llm_multimodal_features",
    "src_jdbc_roundtrip",  # SRC-6 closed round 4 (embedded Derby)
    # new round-4 operators (each mirror-green at sf0.001/0.01/0.1)
    "jn_triangle_count",
    "wn_rrf_rank_fusion",
    "src_parquet_manifest",
    "llm_bigram_logprob",
    "llm_mixture_temperature_weights",
    "llm_curriculum_order",
    "llm_span_corruption_plan",
    "jn_interval_overlap_daily",
    "jn_asof_nearest",
    "etl_vacuum_plan",
    "ag_welch_ttest",
    "llm_dedup_audit_report",
    "llm_bpe_train",
    "wn_gap_fill_interpolate",
    "llm_dedup_threshold_sweep",
    # rows-only -> hash upgrades (the simhash/read_blob precedents)
    "ag_kmv_distinct_sketch",
    "src_binary_files",
    "llm_pack_lineage",
    "llm_pii_scrub",
    "etl_schema_drift_report",
    "jn_interval_containment",
    "llm_code_detect",
)

#: Hash-green driver rows from CORRECTNESS_r03 (48/50; the other two are
#: the no_oracle rows upgraded + regraded above). Folded into the
#: verified tier so round 4's window samples fresh code, not long-green
#: families (VERDICT r3 "Next round" #9).
_R03_GREEN: frozenset = frozenset(
    {
        "wn_lag_gap", "wn_sessionize_events", "wn_range_frame",
        "str_incremental_topk_similarity", "str_tumbling_window",
        "str_sliding_window", "str_session_window", "str_dedup",
        "str_streaming_tumbling", "str_stream_static_join",
        "str_stateful_counter", "str_foreach_batch_sink",
        "str_stream_stream_join", "str_streaming_session",
        "str_streaming_dedup", "str_streaming_sliding",
        "udf_vectorized_scalar", "udf_grouped_agg", "udf_grouped_map",
        "udf_map_in_pandas", "udf_python_udtf", "udf_sql_registration",
        "llm_ngram_jaccard_dedup", "llm_ppjoin_jaccard_dedup",
        "llm_decontaminate", "llm_multimodal_frame_sample",
        "llm_text_stats", "llm_corpus_stats", "llm_tfidf",
        "llm_quality_filter", "llm_lang_id", "llm_token_count",
        "llm_fingerprint", "llm_stratified_sample", "wn_ntile_scalable",
        "q2_min_cost_supplier", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "q11_important_stock",
        "q13_customer_distribution", "q15_top_supplier",
        "q16_supplier_part_count", "q17_small_qty_revenue",
        "q20_excess_shippers", "q22_sales_opportunity",
        "q21_waiting_supplier", "fn_struct",
    }
)

#: Queries with a green driver row in CORRECTNESS_r01 or _r02 (hash-pass or
#: designed rows-only). They go last; the never-graded tier fills the
#: driver's bounded window first (VERDICT r2 "What's missing" #1).
_DRIVER_VERIFIED: frozenset = frozenset(
    {
        # r1 green
        "ag_approx_count_distinct", "ag_corr_regression", "ag_count_distinct",
        "ag_cube", "ag_embedding_centroids", "ag_global", "ag_groupby_multi",
        "ag_grouping_sets", "ag_histogram", "ag_kmv_distinct_sketch",
        "ag_max_by", "ag_percentiles_stddev", "ag_pivot", "ag_rollup",
        "ag_string_agg", "ag_unpivot", "etl_date_spine",
        "etl_hypertable_rollup", "etl_incremental_merge", "etl_latest_record",
        "etl_profile", "etl_scd2_history", "etl_schema_conform",
        "etl_train_test_split", "fn_bitwise", "fn_conditional", "fn_datetime",
        "fn_hash_encode", "fn_hash_spark_native", "fn_json", "fn_string",
        "fn_string_similarity", "jn_asof_event_order", "jn_broadcast_dim",
        "jn_full_outer", "jn_inner_equi", "jn_left_anti", "jn_left_outer",
        "jn_left_semi", "jn_theta_band", "llm_dedup_clusters",
        "llm_exact_dedup", "llm_minhash_near_dup_pairs",
        # llm_ngram_jaccard_dedup / llm_simhash_near_dup were r1-green but
        # stay OUT of this set: simhash's pairing was rewritten in round 3
        # (hot-chunk cap) and VERDICT r2 asked for ngram's post-rewrite
        # re-check, so both re-enter the grading window (llm tier).
        # r2 green (CORRECTNESS_r02.json; excludes the 3 NTZ-red above)
        "fn_math", "fn_array", "fn_map", "ag_collect_list",
        "etl_validate_partition", "q1_pricing_summary", "q3_shipping_priority",
        "q5_revenue_by_nation", "q14_promo_revenue", "q10_returned_items",
        "q6_forecast_revenue", "q4_order_priority", "q12_priority_class",
        "q18_large_orders", "q19_disjunctive_revenue", "llm_topk_cosine",
        "llm_tiled_topk_cosine", "llm_lsh_ann_topk", "llm_embedding_near_dup",
        "llm_semantic_dedup", "llm_ivf_ann_topk", "wn_keep_first",
        "wn_topk_per_group", "wn_rolling_sum", "wn_ntile_percent_rank",
        "wn_first_last_nth", "jn_cross_bounded", "jn_self_pairs",
        "jn_salted_skew", "jn_correlated_subquery", "jn_range_binned",
        "pf_project_derive", "pf_filter_predicates", "pf_regex_extract",
        "pf_null_normalize", "pf_type_casts", "srt_global_sort",
        "srt_global_topk", "srt_within_partitions", "set_union_by_name",
        "set_intersect", "set_except_distinct", "src_parquet_scan",
        "src_csv_ingest", "src_json_decode", "src_binary_files",
        "src_parquet_sink_partitioned",
    }
)


#: Operators added mid-round-3 AFTER the grading window was planned. They
#: rank behind the flagships so they fill whatever window slots remain
#: instead of pushing VERDICT r2's planned regrades out of the driver's
#: bounded (~50-row) window; any spillover is local-mirror-green now and
#: enters the window in round 4.
#:
#: ROUND-4 PLAN: once CORRECTNESS_r03 lands, fold its green rows into
#: _DRIVER_VERIFIED and promote this set to the front of the window —
#: the round-3-late tier (~130 queries after the continuation sessions'
#: analytics/QA/join/sketch batches) plus whatever r03 misses is the
#: entire remaining never-graded population; at ~50 rows per round it
#: drains over rounds 4-6, newest additions last. Registration bar
#: (tightened round 4 per ADVICE r3): local-mirror green at sf0.01 AND
#: adversarial non-UTC session (the repo's /verify drive) AND — for any
#: operator whose output rounds/averages lattice values — an explicit
#: sf0.1 mirror run, because rounding half-boundary traps can pass at
#: sf0.01 by luck (the udf_model_batch_inference lesson).
_ROUND3_LATE: frozenset = frozenset(
    {
        "llm_repetition_filter",
        "etl_pseudonymize",
        "etl_shard_assign",
        "llm_embedding_quantize",
        "llm_boilerplate_ngrams",
        "jn_bucketed_colocated",
        "ag_hll_sketch_union",
        "ag_theta_sketch_setops",
        "etl_k_anonymity_audit",
        "src_compact_small_files",
        "llm_ivfpq_ann_topk",
        "llm_containment_dedup",
        "etl_cdc_snapshot_diff",
        "wn_event_funnel",
        "wn_retention_cohorts",
        "llm_sequence_pack",
        "llm_mixture_sample",
        "llm_keep_best_duplicate",
        "llm_incremental_dedup",
        "llm_unigram_logprob",
        "src_clustered_layout",
        "etl_dynamic_partition_overwrite",
        "ag_ddsketch_quantiles",
        "jn_point_in_time",
        "etl_contiguous_ids",
        "src_zorder_layout",
        "str_streaming_funnel",
        "etl_checksum_table_diff",
        "q3_shipping_priority_sql",
        "wn_timeseries_similarity",
        "llm_sentiment_lexicon",
        "llm_incremental_near_dup",
        "src_schema_evolution",
        "etl_user_erasure",
        "llm_doc_chunking",
        "src_orc_roundtrip",
        "wn_activity_streaks",
        "ag_mad_robust_stats",
        "ag_ratio_to_parent",
        "ag_cumulative_distinct_users",
        "wn_period_over_period",
        "fn_struct",
        "llm_balanced_sample",
        "llm_negative_sampling",
        "llm_hard_negatives",
        "llm_pipeline_e2e",
        "wn_session_conversion",
        "str_foreach_batch_upsert",
        "etl_skew_report",
        "llm_vocab_induction",
        "llm_bigram_pmi",
        "set_intersect_all",
        "set_except_all",
        "srt_nulls_ordering",
        "llm_embedding_qa",
        "llm_dedup_degree_report",
        "wn_ranking_semantics",
        "wn_transition_matrix",
        "wn_attribution_last_touch",
        "wn_gap_fill_locf",
        "jn_null_safe",
        "llm_quality_percentile_filter",
        "llm_compression_ratio",
        "llm_triangle_count",
        "ag_rolling_active_users",
        "ag_chi_square_contingency",
        "llm_weighted_sample",
        "jn_interval_overlap",
        "etl_anomaly_zscore",
        "ag_entropy",
        "src_jsonl_roundtrip",
        "ag_heavy_hitters",
        "wn_pareto_share",
        "ag_market_basket",
        "etl_fk_integrity_audit",
        "wn_event_paths",
        "ag_seasonality_profile",
        "llm_leakage_free_split",
        "ag_rfm_segmentation",
        "wn_seasonal_residual_anomaly",
        "wn_alert_debounce",
        "wn_rolling_median",
        "ag_ks_test",
        "etl_cdc_apply_tombstones",
        "ag_bitmap_distinct",
        "ag_ab_test_proportions",
        "wn_ema_smoothing",
        "ag_ohlc_bars",
        "wn_max_drawdown",
        "etl_winsorize",
        "etl_late_arriving_dim",
        "llm_knn_classifier",
        "llm_pagerank",
        "ag_count_min_sketch",
        "llm_dataset_card",
        "llm_bpe_merge_candidates",
        "wn_change_point",
        "llm_cross_source_overlap",
        "etl_incremental_mv_refresh",
        "wn_skyline_pareto",
        "jn_hierarchy_depth",
        "jn_spatial_grid",
        "jn_bloom_prefilter",
        "jn_fuzzy_match_blocked",
        "etl_join_cardinality",
        "llm_pca_power_iteration",
        "str_streaming_ohlc",
        "etl_medallion_pipeline",
        "udf_model_batch_inference",
        "llm_prefix_dedup",
        "wn_time_weighted_average",
        "llm_tokenizer_apply",
        "jn_asof_tolerance",
        "fn_url",
        "etl_subject_access_report",
        "etl_backfill_plan",
        "ag_gini_coefficient",
        "wn_bollinger_bands",
        "wn_cusum_drift",
    }
)


def _family_rank(name: str) -> int:
    """Family order within the never-graded tier (VERDICT r2 "Next round"
    #3): streaming (13) then UDF surface (6) then LLM-7..10 textstats/
    multimodal (10) then the 12 round-2 flagship plans — 3 regrades + 41
    never-graded ≈ the driver's 50-row window, so every §2 family gains a
    driver hash-pass row across r1–r3."""
    if name in _ROUND3_LATE:
        return 5
    for prefix, rank in (("str_", 1), ("udf_", 2), ("q", 4)):
        if name.startswith(prefix):
            return rank
    return 3  # llm_ textstats + multimodal (all other llm_* are verified)


def _grade_rank(name: str) -> tuple:
    if name in _REGRADE_FIRST:
        return (0, _REGRADE_FIRST.index(name))
    if name in _DRIVER_VERIFIED or name in _R03_GREEN:
        return (99, 0)
    return (_family_rank(name), 0)


def _apply_grade_order() -> None:
    ordered = sorted(_registry.QUERIES, key=_grade_rank)  # stable within rank
    _registry.QUERIES.update(
        {name: _registry.QUERIES.pop(name) for name in ordered}
    )


_apply_grade_order()
