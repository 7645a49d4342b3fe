#!/usr/bin/env python
"""Bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
"sf": ...}.

Methodology mirrors BASELINE.md: one shared SparkSession, each query is run
once to warm (codegen + broadcast + file listing), then timed on THREE
further runs and reported as their MEDIAN — round 4's single-warm-sample
methodology let one GC/JIT interleave in a 36-query session masquerade as a
+27.6% regression (llm_repetition_filter, VERDICT r4 "What's wrong" #2;
isolated re-profiling measured 0.87-1.18 s against the 1.45 s bench row).
The median of 3 bounds that interleaving noise; "value" is the sum of
per-query medians.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def headline_queries() -> list[str]:
    """Headline subset: flagship plans + the heaviest operator families."""
    from sealnet_etl_spark.registry import all_queries

    available = all_queries()
    preferred = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_revenue_by_nation",
        "wn_sessionize_events",
        "jn_asof_event_order",
        "llm_minhash_near_dup_pairs",
        "llm_topk_cosine",
        "llm_exact_dedup",
        "etl_incremental_merge",
        # round-2 additions: cover the heavy tail (TF-IDF shuffle, ANN
        # bucket join, Q18 large-orders semi-join agg, CC iteration loop)
        "llm_tfidf",
        "llm_lsh_ann_topk",
        "q18_large_orders",
        "llm_dedup_clusters",
        # round-3 additions: the NTZ-fixed events/window family, so a
        # regression there shows up as a number, not a -1.0 sentinel
        "wn_range_frame",
        # round-3 training-data ops: narrow scan-speed filters + the
        # boilerplate hot-set join — cheap, but tracked so a UDF fallback
        # or lost pushdown shows up as a per-query regression
        "llm_repetition_filter",
        "llm_boilerplate_ngrams",
        # round-3 late additions: the heavier trainprep/analytics shapes
        # (funnel windows, broadcast-vocab scoring, packing window)
        "llm_unigram_logprob",
        "jn_point_in_time",
        # the four-stage training-data pipeline composition (capstone)
        # round-3 continuation: the second analytics batch's heavier
        # shapes (rolling-distinct explode, day-blocked interval pairing,
        # asof attribution) — tracked so a regression to a range self-join
        # or a global window shows up as a number
        "jn_interval_overlap",
        # round-3 continuation, batches 5-10: the grid-blocked spatial
        # self-join (cell-replication cost), the bloom build+probe path,
        # and the map-side-combined CMS — tracked so a lost broadcast or
        # an exploded candidate set shows up as a per-query regression
        "jn_spatial_grid",
        "jn_bloom_prefilter",
        "ag_count_min_sketch",
        # heaviest of the final batches: 100k sliding mean+stddev frames
        "wn_bollinger_bands",
        # round 4: the re-blocked SimHash (recursive hot-bucket kernel),
        # the oriented triangle wedge closure, and the bigram scoring's
        # double-broadcast pass — the round's heaviest new shapes, plus
        # the Arrow inference kernel whose rounding fix must not cost
        "llm_simhash_near_dup",
        "jn_triangle_count",
        "llm_bigram_logprob",
        # the rollup twin that isolates jn_interval_overlap's JOIN cost
        # from the 617k-row driver-collect tax (see its docstring)
        "jn_interval_overlap_daily",
        # round 5 (VERDICT r4 #9): every remaining round-4 addition with a
        # non-trivial plan — the iterative BPE trainer (bounded-collect
        # loop), the positional interval containment, and the Derby JDBC
        # round trip — so regressions in new code show as trends
        "llm_bpe_train",
        "jn_interval_containment",
        # round-5 semantic changes: the two-sided asof (tie-rule rework)
        # and the 3-regex PII scrub pass — tracked from their change round
        # round-5 new operators: duplicate-substring detection (positioned
        # shingle explode + distinct-doc agg + islands window) and its
        # apply rewrite (span join + positional higher-order cut)
        "llm_substring_dedup_spans",
        "llm_substring_dedup_apply",
        "llm_bm25_topk",
        "str_streaming_near_dup",
        # DSIR importance weights: token explode + doc-bucket partial agg
        # + 256-row broadcast lambda join (the data-selection workhorse)
        "llm_dsir_importance",
        # MMR re-rank: brute top-24 pool + bounded greedy (driver-side K*N)
        "llm_mmr_diversify",
        # positional winnowing: one struct-min frame pass, doc-keyed
        "llm_winnowing_fingerprints",
        # the round-5 statistical + multimodal additions (cheap, tracked
        # so regressions in new code show as trends per VERDICT r4 #9)
        # remaining round-5 additions: VARIANT round trip, _metadata file
        # lineage, Hampel despiker, Allen relation profile, nDCG eval
        "fn_variant_extract",
        "wn_hampel_filter",
        "jn_interval_allen_profile",
        "llm_ndcg_eval",
        # round 6: perceptual blob near-dup (binaryFile scan + chunk-
        # blocked Hamming join), JVM-side chip extraction, and the
        # rewritten compression proxy (char-4-gram zip projection) — new
        # or changed plans tracked from their change round
        "llm_compression_ratio",
        # round 7: the fixed-point PCA (8 Arrow chunk-partial passes —
        # tracked so a lost persist re-scans parquet 8×), the epoch
        # allocator's (source, word) distinct-count aggregate, and the
        # margin miner's tile-kernel + shortlist-join pipeline
        "llm_pca_power_iteration",
        "llm_epoch_budget",
        "llm_margin_mining",
        # round 7, second batch: the epoch materializer (broadcast join +
        # exact-output explode), the sequential-per-shard next-fit pack,
        # the kappa contingency pass, and the RBO retrieval twin
        "llm_epoch_budget_apply",
        "ag_cohens_kappa",
        "llm_rbo_eval",
        # round 8: the packing-waste report (consumes the pack), the
        # banded cross-batch dedup-rate trend (the round's heaviest new
        # plan — minhash + posting-list pairing + verify), and the two
        # narrow report passes — tracked from their change round
        "llm_dedup_rate_trend",
        "llm_quality_trend",
        "llm_dedup_cluster_size_histogram",
        # round 8, late batch: the fertility token scan, the per-source
        # contamination aggregate (broadcast probe + denominator pass),
        # and the materialized-scan + range-exchange Gini — tracked from
        # their change round (llm_mixture_schedule is omitted: flat
        # ~0.2 s by design, the retired-class shape)
        "llm_contamination_report",
        "llm_token_gini",
        # round 9: the fixed-batch hard-negative serving shape (64
        # anchors x full corpus), the per-trigger streaming
        # contamination monitor, and the quality x dedup decision table
        # (two cached parents + id joins) — tracked from their change
        # round
        "llm_hard_negatives_batch",
        "str_contamination_monitor",
        "llm_quality_dedup_crosstab",
        "str_quality_monitor",
        # round 10: the four new incremental/monitoring plans — the
        # fixed-probe contamination monitor (constant broadcast
        # postings), the per-trigger mixture-conformance monitor, the
        # frozen-cell IVF refresh (bounded seed BNLJ + store probe),
        # and the persisted-index perceptual-hash probe — tracked from
        # their change round
        "str_contamination_monitor_fixed",
        "str_mixture_monitor",
        "llm_ivf_index_refresh",
        "llm_multimodal_incremental_near_dup",
        "str_embedding_drift_monitor",
        # (llm_ivf_cell_probe is omitted: sub-second nprobe=1 serve off
        # the same store llm_ivf_index_refresh already times — the
        # llm_mixture_schedule retired-class rationale; driver-graded
        # via CORRECTNESS either way)
        # round 11: the three new IVF-family plans — the multi-cell
        # (nprobe=4) probe's union-candidate serve, the streaming
        # index APPEND (base build + 3-trigger write-ahead store), and
        # the hot-cell split rebalance (full assignment pass + hot-only
        # window + broadcast re-route) — tracked from their change round
        "llm_ivf_cell_probe_nprobe",
        "str_ivf_index_append",
        "llm_ivf_cell_rebalance",
        # round 12: the three new maintenance-loop plans — the
        # post-split probe (rebalance re-derivation + 20-cell serve),
        # the cell-major append-store compaction (one posting-key
        # exchange + file-per-cell rewrite + filesystem audit), and
        # the tombstone/delete leg (base + 3-trigger append+tombstone
        # stream + anti-join + physical-drop compaction) — tracked
        # from their change round
        "llm_ivf_probe_rebalanced",
        "llm_ivf_store_compact",
        "str_ivf_index_delete",
        # round 13 (VERDICT r12 "Next round" #1): the three rows the
        # interrupted round-12 build retired are RESTORED - the driver
        # prices the engine on a continuous per-row history, and the
        # byte budget that forced the retirement is paid instead by the
        # output-line trims documented in main() (OPTIMIZATION_r13.md
        # has the exact byte math).
        "wn_lag_gap",
        "jn_asof_nearest",
        "wn_attribution_last_touch",
    ]
    # round 11: five stable rows retired to fund the three new
    # round-11 rows inside the 2.0 kB tail window (llm_tokenizer_fertility
    # 0.17/0.18, llm_pack_efficiency 0.36/0.41, llm_vocab_growth
    # 0.40/0.43, llm_pack_bins 0.43/0.40, ag_rolling_active_users
    # 0.48/0.46 over r10/r9 - all flat narrow store-read or window
    # passes; still driver-graded via CORRECTNESS).
    # round 10: five stable rows retired to fund the five new round-10
    # rows inside the 2.0 kB tail window (llm_context_length_histogram
    # 0.17, llm_shard_skew_report 0.21, llm_sequence_pack 0.25,
    # wn_event_funnel 0.38, llm_pii_scrub 0.41 - all flat for 2+ rounds;
    # still driver-graded via CORRECTNESS).
    # round 9: five more stable rows retired to fund the three new
    # round-9 rows inside the 2.0 kB tail window (llm_pipeline_e2e 0.37,
    # udf_model_batch_inference 0.37, llm_multimodal_near_dup 0.26,
    # ag_mannwhitney_u 0.43, src_file_provenance 0.46 -
    # all flat for 3+ rounds; still driver-graded via CORRECTNESS).
    # round 8: six sub-0.3 s rows stable for 3+ rounds were RETIRED from
    # the headline list (etl_shard_assign, the three multimodal blob ops,
    # str_tumbling_window, src_jdbc_roundtrip) - the one-line JSON output
    # must fit the driver's ~2.3 kB stdout tail window (VERDICT r7 #6),
    # and with the round-8 additions the list outgrew it. Their plans
    # remain driver-graded every round via CORRECTNESS; the retired
    # timings' last rows live in BENCH_r07.
    names = [n for n in preferred if n in available]
    # Always bench at least the flagships even if the preferred list drifts.
    return names or sorted(available)[:3]


#: Rows whose timed action is the noop sink (guide §1.4) instead of
#: .collect() - a MEASUREMENT fix, not a plan change (VERDICT r12 "Next
#: round" #4): these two queries' declared results are 617k/554k rows,
#: so .collect() times ~3 s of single-threaded py4j row transfer on top
#: of ~0.4-1.0 s of actual computation. The noop sink still computes
#: every column of every row. Old-action (collect) numbers for the
#: switch round are recorded in OPTIMIZATION_r13.md so the r12->r13
#: trend for these two rows is read against the methodology change, and
#: the oracle grading path (which hashes the real rows) is untouched.
NOOP_SINK_QUERIES = frozenset(
    {"jn_interval_overlap", "jn_interval_containment"}
)


def _run(df) -> None:
    """The timed action: collect (the historical methodology), except
    for the declared NOOP_SINK_QUERIES rows (see above)."""
    df.write.format("noop").mode("overwrite").save()


def _round_timing(sec: float) -> float:
    """Byte-bounded precision for the one-line output: 2 decimals below
    1 s (10 ms granularity where it is 1%+ of the value), 1 decimal at
    >= 1 s (quantization <= +/-5% at 1.0 s, shrinking with the value -
    inside the driver's 10% flat band). Measured constraint: the driver
    captures EXACTLY the last 2,000 bytes of stdout (every committed
    BENCH_r*.json tail is len 2000; r07's >2 kB line parsed null), the
    70 query names alone are 1,391 bytes, and 2-decimals everywhere
    puts the line at 2,015+ bytes - a guaranteed parse failure. The
    full byte math is in OPTIMIZATION_r13.md."""
    return round(sec, 2) if sec < 1 else round(sec, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name="sealnet-etl-spark-bench")
    queries = all_queries()
    timings: dict[str, float] = {}
    for name in headline_queries():
        fn = queries[name]
        action = (
            _run
            if name in NOOP_SINK_QUERIES
            else (lambda df: df.collect())
        )
        try:
            action(fn(spark, sf_dir))  # warm: codegen, broadcasts, listing
            samples = []
            for _ in range(3):
                start = time.perf_counter()
                action(fn(spark, sf_dir))
                samples.append(time.perf_counter() - start)
            timings[name] = _round_timing(sorted(samples)[1])  # median of 3
        except Exception as exc:  # a broken query must not zero the bench
            print(f"bench: {name} failed: {exc!r}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 2)

    # "unit" dropped from the line (it was always "sec"; VERDICT r12
    # "Next round" #1 prescribes exactly this trim) - every byte funds
    # the three restored rows under the measured 2,000-byte tail cap.
    def _serialize(qs: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "headline_warm_total",
                "value": total,
                "queries": qs,
                "sf": sf,
            },
            separators=(",", ":"),
        )

    line = _serialize(timings)
    if len(line) > 1999:
        # Guaranteed-parse fallback (never engages at current row
        # counts - the measured near-worst-case line is 1,986 B): a
        # truncated line parses as NOTHING, which costs the whole
        # bench; one uniformly coarser decimal costs 10 ms granularity
        # on the sub-second rows only.
        print(
            f"bench: line is {len(line)} B > 1999 - falling back to "
            "1-decimal rows to stay inside the 2,000 B tail capture",
            file=sys.stderr,
        )
        line = _serialize(
            {k: (round(v, 1) if v >= 0 else v) for k, v in timings.items()}
        )
    elif len(line) > 1960:  # early warning while margin still exists
        print(
            f"bench: WARNING output line is {len(line)} bytes - trim the "
            "headline list or precision before the driver window truncates",
            file=sys.stderr,
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
