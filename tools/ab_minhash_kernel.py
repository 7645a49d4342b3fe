#!/usr/bin/env python
"""A/B: Catalyst 64-fold MinHash signatures vs the Arrow/numpy kernel.

Times the shared signature -> band-key stage (noop sink, min of 3 after a
warm run) and verifies the two forms produce IDENTICAL (doc_id, sig_*)
rows before timing anything.

Usage: python tools/ab_minhash_kernel.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from sealnet_etl_spark.operators.dedup import (
        SHINGLE_K,
        _docs_with_shingles,
        minhash_band_keys,
        minhash_signature_cols,
        minhash_signatures_arrow,
        shingle_base_hashes,
    )
    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name="ab-minhash-kernel")

    shingled = (
        _docs_with_shingles(spark, sf_dir, SHINGLE_K)
        .withColumn("__base", shingle_base_hashes(F.col("shingles")))
        .localCheckpoint()
    )

    catalyst = shingled.select(
        "doc_id", *minhash_signature_cols(F.col("__base"))
    )
    arrow = minhash_signatures_arrow(shingled)

    # equivalence first: exceptAll both ways must be empty
    d1 = catalyst.exceptAll(arrow).count()
    d2 = arrow.exceptAll(catalyst).count()
    print(f"equivalence: catalyst\\arrow={d1} arrow\\catalyst={d2}")
    assert d1 == 0 and d2 == 0, "kernel mismatch"

    def bench(df, label):
        out = df.select("doc_id", F.explode(minhash_band_keys()).alias("bk"))
        spark.sparkContext.setJobDescription(f"ab: {label}")
        out.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(f"{label}: median {sorted(samples)[1]:.3f}s  all={samples}")

    bench(catalyst, "catalyst-fold")
    bench(arrow, "arrow-kernel")
    spark.stop()


if __name__ == "__main__":
    main()
