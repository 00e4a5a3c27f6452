"""Telemetry query library tests: every fixed and parameterized query
from the reference's dashboard/exploration/example surfaces must execute
on fixture-derived silver + dims + gold views, and key ones must return
sane values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import dims, silver
from tagmarshal_data_lakehouse_spark.queries import telemetry
from tagmarshal_data_lakehouse_spark.sources import bronze

from . import fixtures_gen


@pytest.fixture(scope="module")
def views(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("telemetry_bronze")
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
    fact = parts[0].unionByName(parts[1], allowMissingColumns=True).cache()

    topo = dims.topology_to_df(spark, dims.infer_topology(fact))
    profile = dims.read_course_profile_seed(spark, str(d / "profile.csv"))
    sections = dims.build_sections_per_hole(fact)
    telemetry.register_views(
        spark, fact, topo, profile, sections, build_gold=True
    )
    return fact


def test_all_fixed_queries_execute(spark, views):
    for name in telemetry.TELEMETRY_QUERIES:
        df = telemetry.run_telemetry_query(spark, name)
        assert df.count() >= 0, name


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


def test_all_parameterized_queries_execute(spark, views):
    assert set(PARAM_CASES) == set(telemetry.PARAMETERIZED)
    for name, params in PARAM_CASES.items():
        df = telemetry.run_telemetry_query(spark, name, **params)
        assert df.count() >= 0, name


def test_demo_loop_fatigue_scopes(spark, views):
    for scope in ["all", "eligible", "complete"]:
        df = telemetry.run_telemetry_query(
            spark, "get_demo_loop_fatigue",
            course_id="americanfalls", hole_number=5, scope=scope,
        )
        assert df.count() >= 0, scope


def test_overview_stats_values(spark, views):
    row = telemetry.run_telemetry_query(spark, "overview_stats").collect()[0]
    assert row["total_courses"] == 2
    assert row["total_events"] == views.count()
    real = views.filter(~F.col("is_location_padding")).count()
    assert row["real_events"] == real


def test_round_sample_quoting_is_injection_safe(spark, views):
    # single quotes must be escaped, not break the statement
    df = telemetry.run_telemetry_query(
        spark, "get_round_sample", course_id="o'malley's"
    )
    assert df.count() == 0


def test_padding_analysis_consistency(spark, views):
    rows = telemetry.run_telemetry_query(spark, "padding_analysis").collect()
    for r in rows:
        assert r["padding_events"] + r["real_events"] == r["total_events"]
        assert 0 <= r["padding_pct"] <= 100


def test_round_validation_summary_bounds(spark, views):
    rows = telemetry.run_telemetry_query(spark, "round_validation_summary").collect()
    for r in rows:
        for c in ["pct_duration_valid", "pct_events_valid", "pct_pace_valid"]:
            assert 0 <= r[c] <= 100, (r["course_id"], c)


def test_quality_score_bounds(spark, views):
    rows = telemetry.run_telemetry_query(spark, "data_quality_score").collect()
    for r in rows:
        assert 0 <= float(r["quality_score"]) <= 100
        assert r["quality_category"] in {"Excellent", "Good", "Fair", "Poor", "Critical"}


def test_course_profile_loop_flag(spark, views):
    rows = telemetry.run_telemetry_query(spark, "loop_courses").collect()
    assert {r["course_id"] for r in rows} == {"americanfalls"}
