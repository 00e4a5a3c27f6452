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


def _dtype_class(s: pd.Series) -> str:
    """Coarse transport-dtype class: the driver hashes TYPED values, so
    int64 58 and float64 58.0 hash differently even though they compare
    equal numerically (the r08 `telemetry_hole_duration` red: Spark
    FLOOR ships BIGINT where DuckDB FLOOR ships DOUBLE). Classifying at
    this granularity — not exact dtype — tolerates width differences
    (int32 vs int64) that the transport normalizes, while catching every
    class the driver's hash distinguishes."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


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
        # Transport-dtype class parity (r08 blind spot): _values_equal
        # accepts int 58 == float 58.0, but the driver hashes typed
        # values and reds exactly that pair. Flag the divergence even
        # when every value compares equal.
        ca, cb = _dtype_class(a[col]), _dtype_class(b[col])
        if ca != cb:
            problems.append(
                f"col {col}: transport dtype class diverges: spark={ca} "
                f"({a[col].dtype}) vs oracle={cb} ({b[col].dtype}) — the "
                "driver hashes typed values, so this reds even if values match"
            )
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


def run_query_pair(spark, q: Query, sf_dir: str, require_rows: bool = False) -> list[str]:
    """Execute spark + oracle side and compare; [] means parity.
    `require_rows=True` additionally flags an empty Spark result (a
    0=0 row match proves nothing about the query's logic)."""
    sdf = q.build(spark, sf_dir).toPandas()
    if require_rows and len(sdf) == 0:
        return [f"{q.name}: empty spark result at {sf_dir}"]
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    return compare(sdf, odf)


# ---------------------------------------------------------------------------
# Same-text two-engine oracle: run Spark SQL texts on DuckDB unchanged.
#
# The gold models and the telemetry query library are declared as Spark
# SQL strings. DuckDB parses the same texts once a handful of Spark
# function spellings are defined as macros — turning every such query
# into a hard two-engine oracle without hand-porting the SQL.
# ---------------------------------------------------------------------------

# Everything else in the query texts (BOOL_OR, FILTER clause, GREATEST,
# NULLIF, DATE_TRUNC, HOUR/YEAR/MONTH/DAY, LAG/RANK/ROW_NUMBER, ||,
# CASE, COUNT DISTINCT over CASE, STDDEV=sample-stddev) parses and
# evaluates identically.
SPARK_DIALECT_MACROS = [
    "SET TimeZone = 'UTC'",
    "CREATE MACRO UNIX_TIMESTAMP(x) AS CAST(epoch(x::TIMESTAMP) AS BIGINT)",
    # Spark: 1=Sunday..7=Saturday; via isodow (1=Mon..7=Sun) because a
    # dayofweek()-based macro would shadow DuckDB's case-insensitive
    # builtin of the same name and recurse. Same for DATEDIFF/date_diff.
    "CREATE MACRO DAYOFWEEK(x) AS CAST((isodow(x::DATE) % 7) + 1 AS INT)",
    "CREATE MACRO DATEDIFF(a, b) AS date_diff('day', b::DATE, a::DATE)",
    "CREATE MACRO DATE_FORMAT(x, f) AS CASE WHEN f = 'MMMM' THEN monthname(x::TIMESTAMP) WHEN f = 'EEEE' THEN dayname(x::TIMESTAMP) END",
    "CREATE MACRO COLLECT_LIST(x) AS list(x)",
    "CREATE MACRO COLLECT_SET(x) AS list(DISTINCT x)",
    "CREATE MACRO SORT_ARRAY(x) AS list_sort(x)",
    "CREATE MACRO ARRAY_DISTINCT(x) AS list_distinct(x)",
    "CREATE MACRO SIZE(x) AS len(x)",
    # every call site uses TRUNC(date,'MM'); shadows numeric trunc()
    # inside oracle connections only
    "CREATE MACRO TRUNC(x, f) AS CAST(date_trunc('month', x::DATE) AS DATE)",
    # every call site joins with '+'; array_to_string requires a
    # constant separator, unavailable through a macro parameter
    "CREATE MACRO ARRAY_JOIN(x, s) AS array_to_string(x, '+')",
    # Spark's DATE(x) function form; DuckDB only has the cast
    "CREATE MACRO DATE(x) AS x::DATE",
    # Spark ROUND rounds the SHORTEST DECIMAL REPRESENTATION of a double
    # (BigDecimal.valueOf path): ROUND(4.35d, 1) = 4.4 even though the
    # binary value is 4.3499999999999996, which DuckDB's binary-value
    # round takes to 4.3. The VARCHAR roundtrip reproduces Spark's
    # behavior exactly (DuckDB's double->VARCHAR is shortest-repr).
    # Installed as SPARK_ROUND and substituted textually (no 1-arg ROUND
    # exists in the query surface; macro overloading is unavailable).
    # Scale 20 so the intermediate decimal holds every fraction digit of
    # a shortest-repr double below 1e18 without a pre-round (scale 15
    # would round 4.6499999999999995 UP at digit 15 before the real
    # rounding step).
    "CREATE MACRO SPARK_ROUND(x, n) AS round(CAST(x::VARCHAR AS DECIMAL(38,20)), n)::DOUBLE",
]


def spark_sql_to_duckdb(sql: str) -> str:
    """Per-statement rewrites that macros cannot express.

    PERCENTILE_APPROX appears under FILTER clauses, which DuckDB only
    accepts on true aggregates (not macros) — substitute the aggregate
    name textually. median_* output columns are excluded from value
    compares anyway (quantile sketches are engine-specific); the
    substitution only keeps the statement runnable.

    ROUND is substituted for the Spark-semantics SPARK_ROUND macro (see
    SPARK_DIALECT_MACROS) so half-boundary doubles round identically.
    """
    import re

    # The quantile_disc substitution is only semantics-preserving-enough
    # for the 2-arg PERCENTILE_APPROX(col, p) form (3-arg adds an
    # accuracy parameter quantile_disc does not take — it would not even
    # parse). Guard the arity so a future 3-arg call site fails loudly
    # here instead of as a confusing DuckDB binder error.
    for m in re.finditer(r"PERCENTILE_APPROX\(", sql):
        depth, commas = 1, 0
        for ch in sql[m.end():]:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                commas += 1
        assert commas == 1, (
            "spark_sql_to_duckdb only supports 2-arg PERCENTILE_APPROX; "
            f"found {commas + 1} args at: ...{sql[m.start():m.start() + 80]}..."
        )
    sql = sql.replace("PERCENTILE_APPROX(", "quantile_disc(")
    # TIMESTAMPDIFF(UNIT, a, b) -> date_diff('unit', a, b): a macro
    # cannot capture the bare unit keyword. Both forms compute b - a;
    # call sites pre-truncate endpoints to the unit (DATE_TRUNC) so
    # Spark's elapsed-unit truncation and DuckDB's boundary counting
    # coincide exactly.
    sql = re.sub(
        r"\bTIMESTAMPDIFF\(\s*(\w+)\s*,",
        lambda m: f"date_diff('{m.group(1).lower()}',",
        sql,
        flags=re.IGNORECASE,
    )
    return re.sub(r"\bROUND\(", "SPARK_ROUND(", sql, flags=re.IGNORECASE)


def _normalize_dates(df: pd.DataFrame) -> pd.DataFrame:
    """Spark DATE columns arrive as python date objects, DuckDB's as
    datetime64 — unify so sorting and comparison see one type."""
    import datetime

    out = df.copy()
    for c in out.columns:
        s = out[c]
        if s.dtype == object:
            nonnull = s.dropna()
            if len(nonnull) and all(
                isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
                for v in nonnull
            ):
                out[c] = pd.to_datetime(s).astype("datetime64[us]")
    return out


def _to_float(v: Any) -> Any:
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _values_close(a: Any, b: Any) -> bool:
    a, b = _to_float(a), _to_float(b)
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        # doubles accumulated in different partition/visit orders agree
        # to ~1e-12 relative; everything integral/rounded is exact
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare_tolerant(
    sdf: pd.DataFrame,
    odf: pd.DataFrame,
    drop_prefixes: tuple[str, ...] = ("median_",),
) -> list[str]:
    """Two-engine frame compare: exact on everything except float
    accumulation jitter; sketch columns (drop_prefixes) excluded."""
    drop = [
        c for c in set(sdf.columns) | set(odf.columns) if c.startswith(drop_prefixes)
    ]
    a = canonicalize(_normalize_dates(sdf.drop(columns=[c for c in drop if c in sdf.columns])))
    b = canonicalize(_normalize_dates(odf.drop(columns=[c for c in drop if c in odf.columns])))
    if list(a.columns) != list(b.columns):
        return [f"columns: spark={list(a.columns)} duckdb={list(b.columns)}"]
    if len(a) != len(b):
        return [f"rows: spark={len(a)} duckdb={len(b)}"]
    # Re-sort BOTH frames by a shared key order: columns float-typed in
    # EITHER frame go last (Spark may type a count BIGINT where DuckDB's
    # SUM arrives float64 — a per-frame classification would sort the
    # frames differently), so float jitter can never reorder rows.
    floatish = {
        c
        for c in a.columns
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c])
    }
    key_cols = [c for c in a.columns if c not in floatish] + [
        c for c in a.columns if c in floatish
    ]
    if key_cols:
        a = a.sort_values(by=key_cols, na_position="last", kind="mergesort").reset_index(drop=True)
        b = b.sort_values(by=key_cols, na_position="last", kind="mergesort").reset_index(drop=True)
    problems = []
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_close(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {col}: {len(bad)}/{len(av)} differ; row {i}: "
                f"spark={x!r} duckdb={y!r}"
            )
    return problems
