"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet files, canonicalizes both frames (columns sorted by name, rows
sorted by all columns, timestamps normalized), and compares values
EXACTLY — stricter than a hash match, so anything passing here should
hash-match in the driver.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from tagmarshal_data_lakehouse_spark.queries import TABLES, Query


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # array cells arrive as ndarray (DuckDB) or list (Spark):
            # normalize to tuples so multi-key sorting can factorize them
            out[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") else v
            )
    out = out.sort_values(by=list(out.columns), na_position="last", kind="mergesort")
    return out.reset_index(drop=True)


def _values_equal(a: Any, b: Any) -> bool:
    if a is None and b is None:
        return True
    # scalar NULLs of any dtype (None, NaT, nan) hash identically after
    # canonicalization — NaT == NaT is False under plain comparison, so
    # check missing-ness explicitly (lists/arrays fall through)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact: driver hashes values
    return a == b


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    import decimal

    problems: list[str] = []
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return [f"column mismatch: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count mismatch: spark={len(a)} oracle={len(b)}"]
    for col in a.columns:
        # A DecimalType on either side (object dtype holding Decimal) is a
        # hash hazard even when numerically equal — queries must emit
        # DOUBLE/BIGINT, never decimal (see queries/__init__.py contract).
        for side, frame in (("spark", a), ("oracle", b)):
            s = frame[col]
            if s.dtype == object and s.map(lambda v: isinstance(v, decimal.Decimal)).any():
                problems.append(f"col {col}: {side} side emits Decimal values (type hazard)")
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {col}: {len(bad)}/{len(av)} values differ; first at row {i}: "
                f"spark={x!r} oracle={y!r}"
            )
    return problems


def run_query_pair(spark, q: Query, sf_dir: str) -> list[str]:
    """Execute spark + oracle side and compare; [] means parity."""
    sdf = q.build(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    return compare(sdf, odf)
