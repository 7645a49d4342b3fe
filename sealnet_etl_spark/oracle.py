"""Local mirror of the driver's DuckDB-oracle correctness harness.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row-count + schema +
order-insensitive value-hash (SURVEY.md §0.2). This module reproduces that
comparison locally (tests + pre-commit gate) so hash-discipline failures
(float summation order, timezone, tie-breaks — SURVEY.md §5.3) are caught
in-repo, not by the driver.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
from typing import Any

import duckdb

from .registry import QUERIES, all_queries
from .sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the 10 parquet views exactly as the driver does."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon_cell(value: Any) -> Any:
    """Canonicalize one cell so Spark- and DuckDB-sourced values compare equal."""
    if value is None:
        return None
    # numpy scalars → python
    if hasattr(value, "item") and type(value).__module__ == "numpy":
        value = value.item()
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == 0.0:
            return 0.0  # -0.0 == 0.0
        return value
    if isinstance(value, _dt.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, _dt.date):
        return value.isoformat()
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).hex()
    if isinstance(value, dict):  # DuckDB struct
        return tuple(sorted((k, canon_cell(v)) for k, v in value.items()))
    if hasattr(value, "asDict"):  # pyspark Row (struct column)
        return tuple(sorted((k, canon_cell(v)) for k, v in value.asDict().items()))
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        return tuple(canon_cell(v) for v in value)
    return value


def rows_to_multiset(columns: list[str], rows: list[tuple]) -> Counter:
    """Order-insensitive canonical form: sort columns by name, rows as bag."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(canon_cell(row[i]) for i in order) for row in rows)


def compare_query(spark, name: str, sf_dir: str) -> dict[str, Any]:
    """Run one registered query against its oracle; return a match report."""
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    report: dict[str, Any] = {
        "name": name,
        "survey_id": spec.survey_id,
        "spark_rows": len(spark_rows),
    }
    if spec.oracle is None:
        report["status"] = "rows_only"
        report["match"] = True
        return report
    con = duck_connection(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
    finally:
        con.close()
    report["duck_rows"] = len(duck_rows)
    if sorted(spark_cols) != sorted(duck_cols):
        report["status"] = "schema_mismatch"
        report["spark_cols"] = sorted(spark_cols)
        report["duck_cols"] = sorted(duck_cols)
        report["match"] = False
        return report
    spark_bag = rows_to_multiset(spark_cols, spark_rows)
    duck_bag = rows_to_multiset(duck_cols, duck_rows)
    if spark_bag == duck_bag:
        report["status"] = "hash_match"
        report["match"] = True
    else:
        only_spark = list((spark_bag - duck_bag).items())[:3]
        only_duck = list((duck_bag - spark_bag).items())[:3]
        report["status"] = "value_mismatch"
        report["only_spark"] = only_spark
        report["only_duck"] = only_duck
        report["match"] = False
    return report


def run_all(spark, sf_dir: str) -> list[dict[str, Any]]:
    return [compare_query(spark, name, sf_dir) for name in sorted(all_queries())]
