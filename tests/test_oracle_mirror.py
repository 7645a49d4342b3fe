"""Mirror of the driver's t2 correctness gate: every registered query vs its
DuckDB oracle at sf0.01, same canonicalization, same order-insensitive
comparison (SURVEY.md §5.2.2)."""

from __future__ import annotations

import pytest

from sealnet_etl_spark.oracle import compare_query
from sealnet_etl_spark.registry import all_queries

from .conftest import SF_DIR

QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
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


def test_every_query_runs_at_smoke_sf(spark):
    """All registered queries must at least execute on sf0.001 — and their
    physical plans must pass the scale lint (no CartesianProduct, no
    row-at-a-time Python; tools/plan_lint.py) on the same pass."""
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
