#!/usr/bin/env python
"""Query profiler: run one registered query and print the FINAL adaptive
physical plan annotated with executed metrics — output rows, shuffle
bytes, spills — plus a one-line summary. This is the "measure, don't
guess" companion to tools/plan_lint.py: lint checks the shape, this
shows what actually moved.

Usage:
    python tools/profile_query.py <query_name> [sf_dir]

Flags printed per operator (when non-zero): rows=numOutputRows,
shuffle=dataSize of exchanges, spill=spillSize, files=numFiles.
Summary: wall seconds, exchange count + total shuffled bytes, broadcast
count, total spill (a non-zero spill at bench scale means partitions
are oversized — lower spark.sql.files.maxPartitionBytes or raise
shuffle partitions).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KEEP = ("numOutputRows", "dataSize", "spillSize", "numFiles", "shuffleRecordsWritten")


def collect_metrics(node) -> dict:
    ms = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        ms[kv._1()] = kv._2().value()
    return ms


def walk(node, depth=0, out=None):
    out = out if out is not None else []
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return walk(node.executedPlan(), depth, out)
    out.append((depth, name, collect_metrics(node)))
    n_children = node.children().size()
    if n_children == 0 and name.endswith("QueryStage"):
        # QueryStageExec wraps its materialized subtree behind .plan()
        walk(node.plan(), depth + 1, out)
        return out
    for i in range(n_children):
        walk(node.children().apply(i), depth + 1, out)
    return out


def profile(spark, name: str, sf_dir: str) -> None:
    from sealnet_etl_spark.registry import all_queries

    fn = all_queries()[name]
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    # collect() (not count()) so the executed metrics belong to THIS plan —
    # count() would plan and execute a different aggregate query.
    n = len(df.collect())
    wall = time.monotonic() - t0
    rows = walk(df._jdf.queryExecution().executedPlan())
    n_exchange = n_broadcast = total_shuffle = total_spill = 0
    for depth, op, ms in rows:
        keep = {k: v for k, v in ms.items() if k in KEEP and v}
        spill = sum(v for k, v in ms.items() if "spill" in k.lower())
        if op == "Exchange":
            n_exchange += 1
            total_shuffle += ms.get("dataSize", 0)
        if op == "BroadcastExchange":
            n_broadcast += 1
        total_spill += spill
        tag = " ⚠ SPILL" if spill else ""
        print("  " * depth + f"{op} {keep}{tag}")
    print(
        f"\nsummary: {name} rows={n} wall={wall:.2f}s "
        f"exchanges={n_exchange} shuffled={total_shuffle}B "
        f"broadcasts={n_broadcast} spill={total_spill}B"
    )


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from sealnet_etl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    profile(spark, name, sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
