#!/usr/bin/env python
"""Simulate the grading driver: vanilla adversarial session, entry()
smoke, and compare_query for every registered name at sf0.01.

Usage: python tools/verify_contract.py [names...]   (no names = full sweep)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    rows = mod.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"entry: OK ({len(rows)} rows)")

    from sealnet_etl_spark.oracle import compare_query

    names = sys.argv[1:] or sorted(mod.queries())
    n_fail = 0
    for name in names:
        try:
            rep = compare_query(spark, name, "/root/testdata/sf0.01")
            if rep["status"] == "rows_only":
                ok = rep["match"] and rep["spark_rows"] >= 0
                tag = f"rows_only rows={rep['spark_rows']}"
            else:
                ok = rep["match"]
                tag = "schema=OK hash=MATCH" if ok else f"MISMATCH {rep}"
        except Exception as exc:  # noqa: BLE001
            ok, tag = False, f"ERROR {exc!r}"
        if not ok:
            n_fail += 1
        print(f"{name}: {'PASS' if ok else 'FAIL'} {tag}", flush=True)
    print(f"verify: {len(names) - n_fail}/{len(names)} pass")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
