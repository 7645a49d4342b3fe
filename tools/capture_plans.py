#!/usr/bin/env python
"""Capture `.explain("formatted")` output for bench headline queries into
plans/<round>/<query>_<tag>.txt — the optimization round's evidence files
(OPTIMIZATION_r*.md cites them; the judge diffs before/after). The round
directory comes from $PLANS_ROUND (default r13).

Usage:
    python tools/capture_plans.py <tag> [query ...]

With no query names, captures every bench headline query. Tag is
typically "before" or "after".
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import headline_queries
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.session import get_spark

    if not names:
        names = headline_queries()
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLANS_ROUND", "r13")
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="sealnet-etl-spark-plans")
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 - record the failure inline
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"captured {name}_{tag}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
