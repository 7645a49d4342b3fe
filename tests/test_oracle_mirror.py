"""Mirror of the driver's t2 correctness gate: every registered query vs its
DuckDB oracle at sf0.01, same canonicalization, same order-insensitive
comparison (SURVEY.md §5.2.2).

Round-13 tiering (VERDICT r12 "Next round" #2): the full 339-query mirror
takes ~20+ minutes — past the driver's pytest time cap — so by default only
the high-signal subset runs: the bench flagships + every query whose plan
changed this round (catalog._REGRADE_FIRST, which is exactly the set whose
hashes are at risk). The remaining names carry the `full` marker and run
with SEALNET_FULL_TESTS=1 (per round, logged in OPTIMIZATION_r13.md). The
driver's own 50-slot grading window still oracle-checks every query across
rounds regardless of this local tier split."""

from __future__ import annotations

import pytest

from sealnet_etl_spark.catalog import _REGRADE_FIRST
from sealnet_etl_spark.oracle import compare_query
from sealnet_etl_spark.registry import all_queries

from .conftest import SF_DIR

QUERY_NAMES = sorted(all_queries())

#: Always-on mirror subset: this round's plan-touched queries plus the
#: flagship/headline anchors the driver prices every round.
DEFAULT_MIRROR = frozenset(_REGRADE_FIRST) | {
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q18_large_orders",
    "llm_minhash_near_dup_pairs",
    "llm_topk_cosine",
    "llm_exact_dedup",
    "llm_tfidf",
    "llm_dedup_clusters",
    "llm_substring_dedup_spans",
    "llm_winnowing_fingerprints",
    "str_streaming_near_dup",
    "jn_interval_overlap",
    "jn_interval_containment",
    "wn_lag_gap",
    "jn_asof_nearest",
    "wn_attribution_last_touch",
}

_PARAMS = [
    name
    if name in DEFAULT_MIRROR
    else pytest.param(name, marks=pytest.mark.full)
    for name in QUERY_NAMES
]


@pytest.mark.parametrize("name", _PARAMS)
def test_query_matches_oracle(spark, name):
    report = compare_query(spark, name, SF_DIR)
    assert report["match"], report
    if report["status"] == "rows_only":
        assert report["spark_rows"] >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["n_name", "revenue"]


@pytest.mark.full
def test_every_query_runs_at_smoke_sf(spark):
    """All registered queries must at least execute on sf0.001 — and their
    physical plans must pass the scale lint (no CartesianProduct, no
    row-at-a-time Python; tools/plan_lint.py) on the same pass. Full tier:
    339 query builds + lint + count is minutes of wall clock; the default
    tier's plan-lint coverage comes from test_scale_plans.py plus the
    mirror subset above."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_lint import lint_plan, plan_string

    from .conftest import SMOKE_SF_DIR

    for name, fn in all_queries().items():
        df = fn(spark, SMOKE_SF_DIR)
        hits = lint_plan(name, plan_string(df))
        assert not hits, (name, hits)
        assert df.count() >= 0, name
