"""Events->telemetry bridge contracts (queries/telemetry_bridge.py).

The bridge gives the telemetry library driver rows by mapping the
TPC-H-shaped `events` table into a deterministic fact_telemetry_event
view. These tests pin the cross-engine determinism premises the bridge's
oracles rely on, and that each bridged query is non-vacuous (a mapping
drift that empties a result would otherwise pass the sweep trivially).
"""

from __future__ import annotations

import pytest

from tagmarshal_data_lakehouse_spark.queries import telemetry_bridge


BRIDGE_NAMES = [q.name for q in telemetry_bridge.QUERIES]


def test_bridge_registers_and_pace_is_integer_valued(spark, sf_oracle):
    """`pace` must be an integer-valued double: the decimal-exact AVG
    rewrite is bit-identical across engines only because the inputs
    carry no fractional part."""
    telemetry_bridge._bridged(spark, sf_oracle, "get_avg_pace_by_hole", course_id="course_1")
    fact = spark.table("fact_telemetry_event")
    from pyspark.sql import functions as F

    bad = fact.filter(
        (F.col("pace") != F.floor(F.col("pace")).cast("double"))
        | (F.col("battery_percentage") != F.floor(F.col("battery_percentage")).cast("double"))
    ).count()
    assert bad == 0
    # pace stays in the library's validity window (0, 60)
    out_of_range = fact.filter((F.col("pace") <= 0) | (F.col("pace") >= 60)).count()
    assert out_of_range == 0


@pytest.mark.parametrize("name", BRIDGE_NAMES)
def test_bridge_queries_non_vacuous(spark, sf_oracle, name):
    """Every bridged library query must return rows at the driver's
    sweep scale — an empty frame would make its oracle row meaningless."""
    q = {q.name: q for q in telemetry_bridge.QUERIES}[name]
    assert q.build(spark, sf_oracle).count() > 0


def test_round_grain_durations_fit_validity_window(spark, sf_oracle):
    """(user, day, hour) round grain exists so durations land inside the
    library's 0-600-minute filter — pin that the filter keeps data."""
    df = telemetry_bridge.q_telemetry_round_duration.build(spark, sf_oracle)
    rows = df.collect()
    assert len(rows) > 0
    assert all(0 < r["duration_minutes"] < 600 for r in rows)


def test_gold_coverage_audit_reconciles_by_construction(spark, sf_oracle):
    """The audit model's whole point: every gold aggregate must
    reconcile against the silver counts it was derived from. These are
    the reference's own tripwire identities (gold_coverage_audit.sql),
    asserted on the bridged chain — a drift anywhere in the six-model
    DAG (fact_rounds grain, hole-performance grouping, seasonality
    sums, dim_course presence) breaks one of them."""
    rows = telemetry_bridge._gold_on_bridge(
        spark, sf_oracle, "gold_coverage_audit"
    ).collect()
    assert len(rows) == 3  # user_id % 3 courses
    for r in rows:
        # fact_rounds partitions the non-padding fact exactly
        assert r["gold_fact_rounds_sum_fix_count"] == r["silver_non_padding_rows"]
        assert (
            r["gold_fact_rounds_distinct_rounds"]
            == r["silver_distinct_rounds_non_padding"]
            == r["gold_fact_rounds_rows"]  # one row per round (grain)
        )
        # each seasonality model re-buckets every fact_rounds row once
        assert r["gold_rounds_by_month_sum_rounds"] == r["gold_fact_rounds_rows"]
        assert r["gold_rounds_by_weekday_sum_rounds"] == r["gold_fact_rounds_rows"]
        # hole-perf grain: (round, hole, nine) groups are distinct keys
        assert r["gold_hole_perf_rows"] == r["gold_hole_perf_distinct_round_hole_nine"]
        assert r["gold_hole_perf_distinct_rounds"] <= r["gold_fact_rounds_rows"]
        # dim_course present with the bridge topology's two nines
        assert r["gold_dim_course_present"] == 1
        assert r["unit_count"] == 2
