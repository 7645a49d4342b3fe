#!/usr/bin/env python
"""A/B: scratch root (stores + streaming checkpoints + replay dirs) on the
repo disk vs tmpfs (/dev/shm), per the round-12 "Not yet optimized" item 2
(streaming micro-batch machinery) and guide §6 (I/O placement).

Each condition runs in its OWN process (the replay memo caches absolute
paths), bench methodology per query: warm run + median of 3 fresh-plan
collects. Conditions alternate A,B,A,B per query so box drift lands on
both sides.

Usage: python tools/ab_scratch_fs.py <query> [query ...]
       (child mode is internal: --child <root> <query>)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# ADVICE r12: derive from the repo root (already computed for sys.path)
# and honor SPARK_GRAFT_SF_DIR like profile_build_time.py does
DISK_ROOT = str(Path(__file__).resolve().parent.parent / ".scratch")
TMPFS_ROOT = "/dev/shm/sealnet-etl-scratch-ab"


def child(root: str, name: str) -> None:
    import os

    import sealnet_etl_spark.sources.ingest as ingest

    ingest.SCRATCH_DIR = root
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name=f"ab-scratch-{name}")
    fn = all_queries()[name]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.sparkContext.setJobDescription(f"ab_scratch warm {name}")
    fn(spark, sf_dir).collect()
    samples = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"ab_scratch timed{i} {name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
    print(json.dumps({"root": root, "query": name, "samples": samples,
                      "median": sorted(samples)[1]}))
    spark.stop()


def main() -> None:
    if len(sys.argv) < 2:  # ADVICE r12: usage instead of IndexError
        sys.exit(__doc__)
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    import shutil

    # ADVICE r12: stale tmpfs state from a prior invocation must not
    # leak into this run's warm pass
    shutil.rmtree(TMPFS_ROOT, ignore_errors=True)
    for name in sys.argv[1:]:
        for root in (DISK_ROOT, TMPFS_ROOT, DISK_ROOT, TMPFS_ROOT):
            out = subprocess.run(
                [sys.executable, __file__, "--child", root, name],
                capture_output=True, text=True, check=False,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            print(line[-1] if line else f"FAILED {name} {root}: {out.stderr[-400:]}")


if __name__ == "__main__":
    main()
