"""DuckDB oracle parity for the telemetry query library.

The 74 fixed + 20 parameterized telemetry queries (the reference's
dashboard/exploration/example SQL surfaces) were previously covered
only by executes-and-sane-values tests.  This suite runs the SAME SQL
texts on DuckDB over identical silver/dim parquet — with the gold DAG
materialized on both engines first, since several queries read gold
views — and compares full result frames value-by-value.

Exclusions, each for a stated reason:
- median_* columns (quantile sketches are engine-specific) — handled
  by compare_tolerant's drop_prefixes;
- queries whose LIMIT cuts through unordered ties, where the ROW
  SELECTION (not just order) is legitimately engine-dependent.
"""

from __future__ import annotations

import duckdb
import pytest

from tagmarshal_data_lakehouse_spark import dims, silver
from tagmarshal_data_lakehouse_spark.gold.models import MODELS
from tagmarshal_data_lakehouse_spark.queries import telemetry
from tagmarshal_data_lakehouse_spark.sources import bronze

from . import fixtures_gen
from .oracle_harness import SPARK_DIALECT_MACROS, compare_tolerant, spark_sql_to_duckdb

# LIMIT-through-ties: these queries cap an ordering whose key is not
# total, so which tied rows survive the cutoff is engine-dependent.
# They stay covered by the executes+bounds tests in
# test_telemetry_queries.py; everything else must match exactly.
NONDETERMINISTIC_LIMIT: set[str] = set()

FIXED_NAMES = sorted(telemetry.TELEMETRY_QUERIES)

PARAM_CASES = {
    "get_round_sample": {"course_id": "americanfalls"},
    "get_course_topology_map_points": {"course_id": "americanfalls"},
    "get_round_nine_combinations_for_course": {"course_id": "americanfalls"},
    "get_round_validation_for_course": {"course_id": "americanfalls"},
    "get_round_duration_for_course": {"course_id": "americanfalls"},
    "get_hole_duration_for_course": {"course_id": "americanfalls"},
    "get_round_progression": {"course_id": "americanfalls", "round_id": "round001"},
    "get_round_map_points": {"course_id": "americanfalls", "round_id": "round001"},
    "get_round_progression_summary": {"course_id": "americanfalls"},
    "get_pace_by_hole_for_course": {"course_id": "americanfalls"},
    "get_pace_by_section_for_course": {"course_id": "americanfalls"},
    "get_nine_loop_pace_comparison": {"course_id": "americanfalls"},
    "get_pace_comparison_for_hole": {"course_id": "americanfalls", "hole_number": 5},
    "get_avg_pace_by_hole": {"course_id": "americanfalls"},
    "get_start_hole_distribution": {"course_id": "indiancreek"},
    "get_check_loop_fatigue": {"course_id": "americanfalls", "hole_number": 5},
    "get_demo_unit_summary": {"course_id": "americanfalls"},
    "get_demo_loop_fatigue": {"course_id": "americanfalls", "hole_number": 5},
    "get_demo_boundary_support": {"course_id": "americanfalls"},
    "get_demo_hole_max_outlier": {"course_id": "americanfalls"},
}


@pytest.fixture(scope="module")
def telemetry_pair(spark, tmp_path_factory):
    """(spark, duckdb_con): both engines hold identical silver + dims +
    the gold DAG; telemetry queries then run on both."""
    d = tmp_path_factory.mktemp("telemetry_oracle")
    json_dir = d / "json_plain"
    json_dir.mkdir()
    fixtures_gen.write_plain_json(str(json_dir / "rounds.json"))
    csv_dir = d / "csv_ragged"
    fixtures_gen.write_ragged_csvs(str(csv_dir))
    fixtures_gen.write_course_profile_seed(str(d / "profile.csv"))

    parts = []
    for sub, course in [("json_plain", "americanfalls"), ("csv_ragged", "indiancreek")]:
        raw, fmt = bronze.read_rounds(spark, str(d / sub))
        parts.append(silver.transform_rounds(raw, fmt, course, "2024-01-16", None))
    fact = parts[0].unionByName(parts[1], allowMissingColumns=True)

    topo = dims.topology_to_df(spark, dims.infer_topology(fact))
    profile = dims.read_course_profile_seed(spark, str(d / "profile.csv"))
    sections = dims.build_sections_per_hole(fact)

    paths = {}
    for name, df in [
        ("fact_telemetry_event", fact),
        ("dim_facility_topology", topo),
        ("dim_course_profile", profile),
        ("dim_sections_per_hole", sections),
    ]:
        p = str(d / f"{name}.parquet")
        df.write.parquet(p)
        paths[name] = p

    telemetry.register_views(
        spark,
        spark.read.parquet(paths["fact_telemetry_event"]),
        spark.read.parquet(paths["dim_facility_topology"]),
        spark.read.parquet(paths["dim_course_profile"]),
        spark.read.parquet(paths["dim_sections_per_hole"]),
        build_gold=True,
    )

    con = duckdb.connect()
    for stmt in SPARK_DIALECT_MACROS:
        con.execute(stmt)
    for name, p in paths.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}/*.parquet'")
    for m in MODELS:  # gold DAG, topologically ordered
        con.execute(f"CREATE TABLE {m.name} AS {spark_sql_to_duckdb(m.sql)}")
    yield spark, con
    con.close()


def _check(spark, con, sql: str, label: str) -> None:
    sdf = spark.sql(sql).toPandas()
    odf = con.execute(spark_sql_to_duckdb(sql)).fetchdf()
    problems = compare_tolerant(sdf, odf)
    assert not problems, f"{label}: {problems[:3]}"


@pytest.mark.parametrize("name", FIXED_NAMES)
def test_fixed_query_matches_duckdb(telemetry_pair, name):
    if name in NONDETERMINISTIC_LIMIT:
        pytest.skip("LIMIT cuts through unordered ties (row selection engine-dependent)")
    spark, con = telemetry_pair
    _check(spark, con, telemetry.TELEMETRY_QUERIES[name], name)


@pytest.mark.parametrize("name", sorted(PARAM_CASES))
def test_parameterized_query_matches_duckdb(telemetry_pair, name):
    spark, con = telemetry_pair
    sql = telemetry.PARAMETERIZED[name](**PARAM_CASES[name])
    _check(spark, con, sql, name)


def test_every_parameterized_query_covered():
    assert set(PARAM_CASES) == set(telemetry.PARAMETERIZED)
