"""DuckDB oracle parity for the gold model DAG.

The 20 gold models are declared as Spark SQL texts (gold/models.py).
This suite executes the SAME texts on DuckDB — after defining a small
set of compatibility macros for the function names DuckDB spells
differently — over the identical silver parquet, materializing the DAG
in dependency order, then compares every model's full result frame
value-by-value.  That turns the gold surface from
hand-written-expectation tests into a hard two-engine oracle, the same
standard the relational/events/tpch queries already meet.

Reference contracts mirrored: grain per pipeline/gold/models/gold/
schema.yml:8-10; the coverage-audit reconciliation of
gold_coverage_audit.sql.

Approximate-sketch columns (median_* via percentile_approx) are
engine-specific by construction and are excluded from the value
compare; everything else — counts, sums, averages, rates, rounded
percentages, arrays, labels, timestamps — must agree.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from tagmarshal_data_lakehouse_spark import dims, silver
from tagmarshal_data_lakehouse_spark.gold import models as gold_models
from tagmarshal_data_lakehouse_spark.gold.models import MODELS, GoldBuilder
from tagmarshal_data_lakehouse_spark.sources import bronze

from . import fixtures_gen
from .oracle_harness import canonicalize

MODEL_NAMES = [m.name for m in MODELS]

# Spark-function -> DuckDB spellings. Everything else in the model SQL
# (BOOL_OR, FILTER clause, GREATEST, NULLIF, DATE_TRUNC, HOUR/YEAR/
# MONTH/DAY, ||, CASE, COUNT DISTINCT over CASE) parses identically.
_DUCK_MACROS = [
    "SET TimeZone = 'UTC'",
    "CREATE MACRO UNIX_TIMESTAMP(x) AS CAST(epoch(x::TIMESTAMP) AS BIGINT)",
    # Spark: 1=Sunday..7=Saturday; via isodow (1=Mon..7=Sun) because a
    # dayofweek()-based macro would shadow DuckDB's case-insensitive
    # builtin of the same name and recurse
    "CREATE MACRO DAYOFWEEK(x) AS CAST((isodow(x::DATE) % 7) + 1 AS INT)",
    "CREATE MACRO DATE_FORMAT(x, f) AS CASE WHEN f = 'MMMM' THEN monthname(x::TIMESTAMP) WHEN f = 'EEEE' THEN dayname(x::TIMESTAMP) END",
    "CREATE MACRO COLLECT_LIST(x) AS list(x)",
    "CREATE MACRO SORT_ARRAY(x) AS list_sort(x)",
    "CREATE MACRO ARRAY_DISTINCT(x) AS list_distinct(x)",
    "CREATE MACRO SIZE(x) AS len(x)",
]


def _duck_sql(sql: str) -> str:
    # PERCENTILE_APPROX appears under FILTER clauses, which DuckDB only
    # accepts on true aggregates (not macros) — substitute the aggregate
    # name textually. The resulting median_* columns are excluded from
    # the value compare anyway (quantile sketches are engine-specific);
    # the substitution only keeps the statement runnable.
    return sql.replace("PERCENTILE_APPROX(", "quantile_disc(")

# quantile-sketch outputs: engine-specific, excluded from the compare
_APPROX_PREFIXES = ("median_",)


@pytest.fixture(scope="module")
def gold_pair(spark, tmp_path_factory):
    """(spark_built, duckdb_con) with every model materialized on both
    engines from the same silver parquet."""
    d = tmp_path_factory.mktemp("gold_oracle")
    json_dir = d / "json_plain"
    json_dir.mkdir()
    fixtures_gen.write_plain_json(str(json_dir / "rounds.json"))
    mongo_dir = d / "json_mongo"
    mongo_dir.mkdir()
    fixtures_gen.write_mongo_json(str(mongo_dir / "rounds.json"))
    csv_dir = d / "csv_ragged"
    fixtures_gen.write_ragged_csvs(str(csv_dir))

    parts = []
    for sub, course in [
        ("json_plain", "americanfalls"),
        ("json_mongo", "mongocourse"),
        ("csv_ragged", "csvcourse"),
    ]:
        raw, fmt = bronze.read_rounds(spark, str(d / sub))
        parts.append(silver.transform_rounds(raw, fmt, course, "2024-01-16", None))
    # a low-battery clone course so device_health_errors and the
    # battery-tier quality columns exercise non-empty paths
    from pyspark.sql import functions as F

    parts.append(
        parts[0]
        .withColumn("course_id", F.lit("lowbattcourse"))
        .withColumn("battery_percentage", F.col("battery_percentage") * 0.1)
    )
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionByName(p, allowMissingColumns=True)
    topo = dims.topology_to_df(spark, dims.infer_topology(fact))

    # both engines read the identical parquet bytes
    fact_path = str(d / "fact_telemetry_event.parquet")
    topo_path = str(d / "dim_facility_topology.parquet")
    fact.write.parquet(fact_path)
    topo.write.parquet(topo_path)

    spark_built = GoldBuilder(spark).build(
        spark.read.parquet(fact_path), spark.read.parquet(topo_path)
    )

    con = duckdb.connect()
    for stmt in _DUCK_MACROS:
        con.execute(stmt)
    con.execute(
        f"CREATE VIEW fact_telemetry_event AS SELECT * FROM '{fact_path}/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW dim_facility_topology AS SELECT * FROM '{topo_path}/*.parquet'"
    )
    for m in MODELS:  # already topologically ordered
        con.execute(f"CREATE TABLE {m.name} AS {_duck_sql(m.sql)}")
    yield spark_built, con
    con.close()


def _to_float(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _values_close(a, b) -> bool:
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


def _compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    drop = [
        c
        for c in set(sdf.columns) | set(odf.columns)
        if c.startswith(_APPROX_PREFIXES)
    ]
    a = canonicalize(_normalize_dates(sdf.drop(columns=[c for c in drop if c in sdf.columns])))
    b = canonicalize(_normalize_dates(odf.drop(columns=[c for c in drop if c in odf.columns])))
    if list(a.columns) != list(b.columns):
        return [f"columns: spark={list(a.columns)} duckdb={list(b.columns)}"]
    if len(a) != len(b):
        return [f"rows: spark={len(a)} duckdb={len(b)}"]
    # Re-sort BOTH frames by a shared key order: columns that are
    # float-typed in EITHER frame go last (Spark may type a count BIGINT
    # where DuckDB's SUM arrives float64 — a per-frame classification
    # would then sort the two frames differently), so float accumulation
    # jitter can never reorder rows relative to each other.
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


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_gold_model_matches_duckdb(gold_pair, name):
    spark_built, con = gold_pair
    sdf = spark_built[name].toPandas()
    odf = con.table(name).fetchdf()
    assert len(sdf) > 0, f"{name}: fixture produced an empty model"
    problems = _compare_frames(sdf, odf)
    assert not problems, f"{name}: {problems[:3]}"


def test_gold_models_all_covered():
    """Every declared model is part of the oracle matrix."""
    assert len(MODEL_NAMES) == len(gold_models.MODELS) == 20
