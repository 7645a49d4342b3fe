"""Local mirror of the driver's DuckDB-oracle correctness harness.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row-count + schema +
order-insensitive value-hash (SURVEY.md §0.2). This module reproduces that
comparison locally (tests + pre-commit gate).

Round-2 hardening (VERDICT.md "What's wrong" #4): the round-1 mirror
canonicalized through Python equality (``8753 == 8753.0``) and flattened
ndarrays to tuples, which masked exactly the two failure classes the driver
punishes — cell *dtype* drift (DuckDB ``ceil``→DOUBLE vs Spark ``ceil``
→BIGINT; DuckDB ``SUM(int)``→HUGEINT→pandas ``object`` vs Spark BIGINT) and
array-typed output columns (the driver's canonicalizer raises ``unhashable
type: numpy.ndarray``). This version goes through the same materialization
path the driver uses — ``DataFrame.toPandas()`` on the Spark side and
``duckdb .df()`` on the oracle side — so both inherit identical
dtype-coercion behavior, then hashes cells as ``(kind, value)`` pairs where
``kind`` distinguishes int64 / float / bool / object-int (HUGEINT) /
datetime / date / decimal, and raises ``ArrayCellError`` on any
list/ndarray/dict cell in an oracle-backed query's output.

Calibration: on the round-1 corpus this mirror must mark exactly the five
driver-red queries red (fn_math, fn_array, fn_map, ag_collect_list,
etl_validate_partition pre-fix) and every driver-green query green —
enforced by tests/test_mirror_strictness.py.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
from decimal import Decimal
from typing import Any

import duckdb
import numpy as np
import pandas as pd

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


class ArrayCellError(TypeError):
    """An oracle-backed query produced a list/ndarray/dict cell — the
    driver's canonicalizer crashes on these ('unhashable type: numpy.ndarray'
    in CORRECTNESS_r01.json), so the mirror refuses them outright."""


def _canon_timestamp(ts: Any) -> tuple:
    t = pd.Timestamp(ts)
    if t.tzinfo is not None:
        t = t.tz_convert("UTC").tz_localize(None)
    # Normalize ns/us/s units to one textual form (driver session runs UTC).
    return ("t", t.isoformat())


def canon_cell_strict(value: Any, col_kind: str) -> tuple:
    """Canonicalize one pandas cell as a (kind, value) pair.

    ``col_kind`` is the pandas dtype.kind of the column ('i'/'u'/'f'/'b'/
    'M'/'O'/...). Dtype drift between engines (int64 vs float64 vs object)
    therefore changes the hash, matching the driver's pandas-based
    comparator. Dates and timestamps are unified to ISO text because both
    engines surface them through interchangeable pandas representations.
    """
    # Nulls first: None / NaN / NaT all hash the same regardless of column
    # dtype (a null doesn't carry an engine-visible dtype in pandas either).
    if value is None or value is pd.NaT:
        return ("null",)
    if isinstance(value, float) and math.isnan(value):
        return ("null",)
    if isinstance(value, np.floating) and np.isnan(value):
        return ("null",)

    if col_kind in ("i", "u"):
        return ("i", int(value))
    if col_kind == "f":
        v = float(value)
        return ("f", 0.0 if v == 0.0 else v)
    if col_kind == "b":
        return ("b", bool(value))
    if col_kind == "M":
        return _canon_timestamp(value)
    if col_kind == "m":
        return ("td", str(pd.Timedelta(value)))

    # object column: canonicalize per-cell, tagging python ints distinctly
    # from int64 columns (DuckDB HUGEINT surfaces as object → driver-red).
    if isinstance(value, np.generic):
        value = value.item()
    if isinstance(value, (list, tuple, np.ndarray, dict)):
        raise ArrayCellError(f"array/map cell in oracle-backed output: {value!r:.80}")
    if isinstance(value, bool):
        return ("b", value)
    if isinstance(value, int):
        return ("O-int", value)
    if isinstance(value, float):
        return ("O-float", 0.0 if value == 0.0 else value)
    if isinstance(value, Decimal):
        return ("O-dec", str(value.normalize()))
    if isinstance(value, _dt.datetime):
        return _canon_timestamp(value)
    if isinstance(value, _dt.date):
        # Driver parity (calibrated on CORRECTNESS_r01): Spark DATE surfaces
        # as datetime.date objects while DuckDB DATE surfaces as midnight
        # datetime64 — the driver hashed fn_datetime/etl_date_spine equal, so
        # dates unify with midnight timestamps.
        return _canon_timestamp(value)
    if isinstance(value, (bytes, bytearray)):
        return ("y", bytes(value).hex())
    if isinstance(value, str):
        return ("s", value)
    return ("?" + type(value).__name__, str(value))


def pdf_to_multiset(pdf: pd.DataFrame) -> Counter:
    """Order-insensitive canonical form: sort columns by name, rows as bag."""
    cols = sorted(pdf.columns)
    kinds = {c: pdf[c].dtype.kind for c in cols}
    series = [pdf[c].tolist() for c in cols]
    return Counter(
        tuple(canon_cell_strict(v, kinds[c]) for c, v in zip(cols, row))
        for row in zip(*series)
    ) if len(pdf) else Counter()


# ---------------------------------------------------------------------------
# Lenient spark-vs-spark helpers (plan tests compare two Spark DataFrames of
# identical provenance, where dtype drift cannot occur — keep round-1 canon).
# ---------------------------------------------------------------------------


def canon_cell(value: Any) -> Any:
    """Lenient canonicalization for spark-vs-spark comparisons ONLY."""
    if value is None:
        return None
    if hasattr(value, "item") and type(value).__module__ == "numpy":
        value = value.item()
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == 0.0:
            return 0.0
        return value
    if isinstance(value, _dt.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, _dt.date):
        return value.isoformat()
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).hex()
    if isinstance(value, dict):
        return tuple(sorted((k, canon_cell(v)) for k, v in value.items()))
    if hasattr(value, "asDict"):
        return tuple(sorted((k, canon_cell(v)) for k, v in value.asDict().items()))
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        return tuple(canon_cell(v) for v in value)
    return value


def rows_to_multiset(columns: list[str], rows: list[tuple]) -> Counter:
    """Lenient order-insensitive form for spark-vs-spark plan tests."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(canon_cell(row[i]) for i in order) for row in rows)


# ---------------------------------------------------------------------------
# Driver-parity comparison
# ---------------------------------------------------------------------------


def compare_query(spark, name: str, sf_dir: str) -> dict[str, Any]:
    """Run one registered query against its oracle; return a match report."""
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    report: dict[str, Any] = {"name": name, "survey_id": spec.survey_id}
    if spec.oracle is None:
        report["spark_rows"] = sdf.count()
        report["status"] = "rows_only"
        report["match"] = True
        return report
    spark_pdf = sdf.toPandas()
    report["spark_rows"] = len(spark_pdf)
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(spec.oracle).df()
    finally:
        con.close()
    report["duck_rows"] = len(duck_pdf)
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        report["status"] = "schema_mismatch"
        report["spark_cols"] = sorted(spark_pdf.columns)
        report["duck_cols"] = sorted(duck_pdf.columns)
        report["match"] = False
        return report
    try:
        spark_bag = pdf_to_multiset(spark_pdf)
        duck_bag = pdf_to_multiset(duck_pdf)
    except ArrayCellError as exc:
        report["status"] = "array_cell"
        report["err"] = str(exc)
        report["match"] = False
        return report
    if spark_bag == duck_bag:
        report["status"] = "hash_match"
        report["match"] = True
    else:
        report["status"] = "value_mismatch"
        report["only_spark"] = list((spark_bag - duck_bag).items())[:3]
        report["only_duck"] = list((duck_bag - spark_bag).items())[:3]
        report["match"] = False
    return report


def run_all(spark, sf_dir: str) -> list[dict[str, Any]]:
    return [compare_query(spark, name, sf_dir) for name in sorted(all_queries())]
