#!/usr/bin/env python
"""Time a list of registered queries with the bench methodology (one warm
run + median of 3 timed .collect() runs) in one session.

Usage: python tools/time_queries.py <name> [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    queries = all_queries()
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        fn(spark, sf_dir).collect()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: median {sorted(samples)[1]:.2f}s  all="
              f"{[round(s, 2) for s in samples]}")
    spark.stop()


if __name__ == "__main__":
    main()
