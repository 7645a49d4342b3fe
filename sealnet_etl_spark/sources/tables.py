"""Typed loaders for the testdata star schema (SURVEY.md §1.2).

Scale notes: `spark.read.parquet` gives the vectorized columnar scan with
predicate pushdown and column pruning for free — downstream operators keep
filters sargable so row-group/page skipping applies at 100 TB. The only
table needing special handling is ``events`` (physical TIMESTAMP(NANOS),
SURVEY.md §1.3): with the legacy nanos flag its ``ts`` arrives as bigint
nanoseconds and is truncated to microseconds, matching the DuckDB oracle's
``ts::TIMESTAMP`` ns→µs truncation exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor (region /
#: nation are bounded by geography; supplier stays << autoBroadcastJoinThreshold
#: at the tested SFs). Joins against these should use F.broadcast.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a typed DataFrame."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns since epoch → µs timestamp; integer `div` truncates, matching
            # the oracle's ts::TIMESTAMP cast (SURVEY.md §1.3/§5.3).
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Newer Spark builds read TIMESTAMP(NANOS) as TIMESTAMP_NTZ (the
            # legacy nanosAsLong flag is dead); NTZ→LTZ under the UTC session
            # TZ is value-identical and restores unix_micros()/ltz-only fns.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-entry queries share plans."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
