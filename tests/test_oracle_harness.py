"""Self-tests for the driver-sim comparison harness.

The r08 round recorded the repo's first red driver row
(`telemetry_hole_duration`) on a pair of frames whose VALUES were equal
— Spark shipped int64 58 where the oracle shipped float64 58.0 — and
`oracle_harness.compare` passed it (a systematic false green: the
driver hashes TYPED values, the harness compared numerically). These
tests pin the dtype-class parity check that closes that blind spot,
pure-pandas so they run without a SparkSession.
"""

from __future__ import annotations

import pandas as pd

from .oracle_harness import compare


def test_int_vs_float_column_flags_even_when_values_match():
    a = pd.DataFrame({"hole_number": [8], "min_duration_min": pd.array([58], dtype="int64")})
    b = pd.DataFrame({"hole_number": [8], "min_duration_min": pd.array([58.0], dtype="float64")})
    problems = compare(a, b)
    assert any("transport dtype class" in p and "min_duration_min" in p for p in problems), problems


def test_bool_vs_int_column_flags():
    a = pd.DataFrame({"k": [1, 2], "flag": pd.array([True, False], dtype="bool")})
    b = pd.DataFrame({"k": [1, 2], "flag": pd.array([1, 0], dtype="int64")})
    problems = compare(a, b)
    assert any("transport dtype class" in p and "flag" in p for p in problems), problems


def test_matching_dtypes_and_values_pass():
    a = pd.DataFrame({"k": pd.array([1, 2], dtype="int64"), "v": pd.array([1.5, 2.5], dtype="float64")})
    b = pd.DataFrame({"k": pd.array([1, 2], dtype="int64"), "v": pd.array([1.5, 2.5], dtype="float64")})
    assert compare(a, b) == []


def test_object_string_columns_do_not_false_flag():
    a = pd.DataFrame({"name": ["x", "y"], "n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"name": ["x", "y"], "n": pd.array([1, 2], dtype="int64")})
    assert compare(a, b) == []
