"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sealnet_etl_spark``; every operator from
SURVEY.md §2 registers itself in ``sealnet_etl_spark.registry`` and is
surfaced here.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives beside this file; keep the import working even
# when the driver loads this module from a different working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sealnet_etl_spark.registry import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q5_revenue_by_nation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shaped 5-way star join) on sf0.001."""
    return all_queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return all_oracles()
