#!/usr/bin/env python
"""Plan lint: walk every registered query's physical plan at the smoke SF
and flag executor-side anti-patterns that would not survive 100 TB:

- ``CartesianProduct``: a non-broadcast all-pairs join (a broadcast
  nested-loop join with a bounded/1-row side is fine and common — scalar
  subquery joins — so only the true cartesian operator is flagged).
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan. Arrow
  paths (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
  plan-level UDTF eval) are the sanctioned Python escape hatches.

Usage: python tools/plan_lint.py [sf_dir]   (prints one line per query)
Exit 1 if any non-allowlisted flag fires. The same checks run inside
tests/test_oracle_mirror.py's smoke pass, so regressions fail the suite
without a second execution sweep.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: Queries allowed to keep a flagged operator, with the reason pinned.
ALLOWLIST: dict[str, str] = {
    # UDTF evaluation is row-based by API contract (SURVEY §2.12 UDF-5);
    # the graded demo is the API surface itself.
    "udf_python_udtf": "BatchEvalPythonUDTF",
}

FLAGS = ("CartesianProduct", "BatchEvalPython")


def plan_string(df) -> str:
    jdf = df._jdf
    sql_ctx = df.sparkSession
    return sql_ctx._jvm.PythonSQLUtils.explainString(
        jdf.queryExecution(), "extended"
    )


def lint_plan(name: str, plan: str) -> list[str]:
    # Remove the allowlisted operator's occurrences FIRST, then check every
    # flag against the remainder — so an allowance for one operator (e.g.
    # BatchEvalPythonUDTF, whose name contains the BatchEvalPython flag)
    # can never mask a different regression (a CartesianProduct, or a
    # genuine row-wise BatchEvalPython) in the same plan.
    allowed = ALLOWLIST.get(name, "")
    scannable = plan.replace(allowed, "") if allowed else plan
    return [flag for flag in FLAGS if flag in scannable]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
            hits = lint_plan(name, plan_string(df))
        except Exception as exc:  # noqa: BLE001 - report, don't mask
            hits = [f"ERROR:{type(exc).__name__}"]
        status = ",".join(hits) if hits else "clean"
        print(f"{name}: {status}", flush=True)
        if hits:
            bad.append(name)
    print(f"flagged: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
