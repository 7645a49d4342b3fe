"""Import every query module so registry registration runs, then order the
registry for the driver's grading pass.

Add one import line per module as operators land (SURVEY.md §7.3 order).

Grading order: the driver grades roughly the first 50 registry entries
each round (in registration order), so the registry is re-ordered after
import to put the queries that need evidence most inside that window.
Round 5's tiers: (0) the three queries whose cross-engine semantics
changed this round, (1) the 93-query never-driver-graded tail
(family-interleaved), (2) the 186 queries already hash-green across
CORRECTNESS_r01-r04.

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

#: Operators whose SEMANTICS changed in round 5 (cross-engine tie/count
#: rules from ADVICE r4) — graded first so the driver re-proves the fix:
#: jn_asof_nearest now arg-maxes vvalue at tied timestamps on BOTH
#: engines (joins.py), jn_interval_overlap_daily shares the asof tie
#: rule in its oracle, llm_pii_scrub counts phones post-email-redact on
#: both engines (textstats.py). New round-5 operators append here as
#: they land.
_REGRADE_FIRST: tuple[str, ...] = (
    "jn_asof_nearest",
    "jn_interval_overlap_daily",
    "llm_pii_scrub",
    # greedy-fold BPE rewrite (replaces the 4-pass replace approximation)
    "llm_bpe_train",
    # oracle path now derived from the shared _drift_base() constant
    "etl_schema_drift_report",
    # rows-only -> hash upgrade: per-bucket physical-layout witness
    "srt_within_partitions",
    # new round-5 operators: cross-doc duplicate-substring spans + apply,
    # and BM25 retrieval scoring (completes tfidf -> bm25 -> rrf fusion)
    "llm_substring_dedup_spans",
    "llm_substring_dedup_apply",
    "llm_bm25_topk",
    # streaming near-dup: MinHash probe of the accumulated per-batch index
    "str_streaming_near_dup",
    # Benford first-digit audit (integer-cent rounding on both engines)
    "ag_benford_audit",
    # DSIR importance weighting (integer micro-unit log-ratio lambdas)
    "llm_dsir_importance",
    # MMR diversified retrieval (integer (7,3) lambda, unrolled CTE oracle)
    "llm_mmr_diversify",
    # binary-blob exact dedup (md5-over-hex content key, read_blob oracle)
    "llm_multimodal_exact_dedup",
    # Mann-Whitney U (doubled mid-ranks keep every statistic integer)
    "ag_mannwhitney_u",
    # positional winnowing fingerprints (MOSS rightmost-min selection)
    "llm_winnowing_fingerprints",
    # Spark 4 VARIANT round trip (lossless typed extraction incl. doubles)
    "fn_variant_extract",
    # per-file lineage rollup via the hidden _metadata scan column
    "src_file_provenance",
    # Hampel robust despiker (doubled-median integers, no float anywhere)
    "wn_hampel_filter",
    # Allen interval-relation profile over the blocked pairing
    "jn_interval_allen_profile",
    # nDCG@10 eval (literal-constant discounts, unrolled identical sums)
    "llm_ndcg_eval",
)

#: ROUND-5 PLAN (VERDICT r4 "Next round" #1): implementation breadth is
#: done (81/81 SURVEY rows); driver hash-evidence is the bottleneck. 93
#: of 279 registered queries have never appeared in any CORRECTNESS
#: file. This tuple IS that tail, family-interleaved (llm/wn/etl/jn/src/
#: str/set/srt/q round-robin) so a shorter-than-expected window still
#: samples every family. At ~50 rows/round the tail drains over rounds
#: 5-6; every query here is local-mirror green (test_oracle_mirror.py
#: full sweep) and the ordering only controls which the bounded driver
#: window re-proves first.
_NEVER_GRADED: tuple[str, ...] = (
    "llm_triangle_count", "wn_event_funnel", "etl_pseudonymize",
    "jn_bucketed_colocated", "src_compact_small_files", "str_streaming_funnel",
    "set_intersect_all", "srt_nulls_ordering", "q3_shipping_priority_sql",
    "llm_pagerank", "wn_retention_cohorts", "etl_shard_assign",
    "jn_point_in_time", "src_clustered_layout", "str_foreach_batch_upsert",
    "set_except_all", "llm_cross_source_overlap", "wn_timeseries_similarity",
    "etl_k_anonymity_audit", "jn_null_safe", "src_zorder_layout",
    "str_streaming_ohlc", "llm_prefix_dedup", "wn_activity_streaks",
    "etl_cdc_snapshot_diff", "jn_hierarchy_depth", "src_schema_evolution",
    "llm_repetition_filter", "wn_period_over_period",
    "etl_dynamic_partition_overwrite",
    "jn_spatial_grid", "src_orc_roundtrip", "llm_boilerplate_ngrams",
    "wn_session_conversion", "etl_contiguous_ids", "jn_bloom_prefilter",
    "src_jsonl_roundtrip", "llm_sentiment_lexicon", "wn_ranking_semantics",
    "etl_checksum_table_diff", "jn_fuzzy_match_blocked",
    "llm_quality_percentile_filter",
    "wn_transition_matrix", "etl_user_erasure", "jn_asof_tolerance",
    "llm_compression_ratio", "wn_attribution_last_touch", "etl_skew_report",
    "llm_dataset_card", "wn_gap_fill_locf", "etl_anomaly_zscore",
    "llm_bpe_merge_candidates", "wn_pareto_share", "etl_fk_integrity_audit",
    "llm_tokenizer_apply", "wn_event_paths", "etl_cdc_apply_tombstones",
    "llm_sequence_pack", "wn_seasonal_residual_anomaly", "etl_winsorize",
    "llm_mixture_sample", "wn_alert_debounce", "etl_late_arriving_dim",
    "llm_keep_best_duplicate", "wn_rolling_median", "etl_incremental_mv_refresh",
    "llm_incremental_dedup", "wn_ema_smoothing", "etl_join_cardinality",
    "llm_unigram_logprob", "wn_max_drawdown", "etl_medallion_pipeline",
    "llm_doc_chunking", "wn_change_point", "etl_subject_access_report",
    "llm_balanced_sample", "wn_skyline_pareto", "etl_backfill_plan",
    "llm_negative_sampling", "wn_time_weighted_average", "llm_pipeline_e2e",
    "wn_bollinger_bands", "llm_vocab_induction", "wn_cusum_drift",
    "llm_bigram_pmi", "llm_weighted_sample", "llm_leakage_free_split",
    "llm_embedding_quantize", "llm_ivfpq_ann_topk", "llm_hard_negatives",
    "llm_embedding_qa", "llm_knn_classifier", "llm_pca_power_iteration",
)


def _grade_rank(name: str) -> tuple:
    """Three tiers: round-5 semantic regrades, then the never-driver-
    graded tail (explicit interleaved order), then everything with green
    driver evidence from r1-r4 (186 queries, zero currently-red).
    Queries registered after this file was planned (new round-5 work)
    land between the tail and the verified tier so they enter the window
    as soon as the tail drains."""
    if name in _REGRADE_FIRST:
        return (0, _REGRADE_FIRST.index(name))
    if name in _NEVER_GRADED:
        return (1, _NEVER_GRADED.index(name))
    return (2, 0)


def _apply_grade_order() -> None:
    ordered = sorted(_registry.QUERIES, key=_grade_rank)  # stable within rank
    _registry.QUERIES.update(
        {name: _registry.QUERIES.pop(name) for name in ordered}
    )


_apply_grade_order()
