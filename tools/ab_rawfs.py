#!/usr/bin/env python
"""A/B: Hadoop LocalFileSystem (CRC sidecar files on every local write —
the default) vs RawLocalFileSystem for the engine's file:// I/O.

Motivation (tools/profile_trigger_floor.py): the warm streaming trigger
floor is ~250 ms of which walCommit+commitOffsets ≈ 110-130 ms — tiny
JSON metadata-log writes that pay the checksummed-LocalFileSystem tax
(create + rename for the file AND its .crc sidecar), as does every
parquet store-write commit.

Each condition runs in its own process; conditions alternate per query.

Usage: python tools/ab_rawfs.py <query> [query ...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RAW_CONF = "spark.hadoop.fs.file.impl=org.apache.hadoop.fs.RawLocalFileSystem"


def child(mode: str, name: str) -> None:
    import sealnet_etl_spark.session as sess
    from sealnet_etl_spark.registry import all_queries

    spark = sess.get_spark(app_name=f"ab-rawfs-{name}")
    got = spark.sparkContext.getConf().get("spark.hadoop.fs.file.impl", "default")
    want = (
        "org.apache.hadoop.fs.RawLocalFileSystem" if mode == "raw" else "default"
    )
    assert got == want, f"conf not applied: {got!r}"
    fn = all_queries()[name]
    sf_dir = "/root/testdata/sf0.1"
    fn(spark, sf_dir).collect()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
    print(json.dumps({"mode": mode, "query": name, "samples": samples,
                      "median": sorted(samples)[1]}))
    spark.stop()


def main() -> None:
    if len(sys.argv) < 2:  # ADVICE r12: usage instead of IndexError
        sys.exit(__doc__)
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    import os

    for name in sys.argv[1:]:
        for mode in ("default", "raw", "default", "raw"):
            env = dict(os.environ)
            if mode == "raw":
                # ADVICE r12: append to any pre-existing submit args so
                # the raw leg differs from the default leg by EXACTLY
                # this one conf (replacing wholesale dropped e.g.
                # --packages and skewed the A/B)
                prev = env.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
                env["PYSPARK_SUBMIT_ARGS"] = prev.replace(
                    "pyspark-shell", f"--conf {RAW_CONF} pyspark-shell"
                ) if "pyspark-shell" in prev else (
                    f"{prev} --conf {RAW_CONF} pyspark-shell"
                )
            out = subprocess.run(
                [sys.executable, __file__, "--child", mode, name],
                capture_output=True, text=True, check=False, env=env,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            print(lines[-1] if lines else f"FAILED {name} {mode}: {out.stderr[-500:]}")


if __name__ == "__main__":
    main()
