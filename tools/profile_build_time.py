#!/usr/bin/env python
"""Split each headline query's wall time into DataFrame CONSTRUCTION
(Python query-function body: plan building, any eager setup work it does)
vs EXECUTION (.collect() on the built frame) — the per-query fixed
overhead the round-12 report flagged as "Not yet optimized" item 1.

Bench methodology: warm full run first, then 3 timed (build, collect)
pairs; medians printed. Queries whose BODY performs eager work (store
builds, streams) show it as build time.

Usage: python tools/profile_build_time.py [query ...]   (default: headline)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import headline_queries
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name="profile-build-time")
    queries = all_queries()
    names = sys.argv[1:] or headline_queries()
    rows = []
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"build-profile {name}")
        fn(spark, sf_dir).collect()  # warm
        builds, runs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            runs.append(t2 - t1)
        b, r = sorted(builds)[1], sorted(runs)[1]
        rows.append((name, b, r))
        print(f"{name:42s} build={b:6.3f}s  collect={r:6.3f}s")
    rows.sort(key=lambda x: -x[1])
    print("\n== top build-time (driver-side construction) ==")
    for name, b, r in rows[:15]:
        print(f"{name:42s} build={b:6.3f}s  collect={r:6.3f}s")
    total_b = sum(b for _, b, _ in rows)
    total_r = sum(r for _, _, r in rows)
    print(f"\ntotals: build={total_b:.2f}s collect={total_r:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
