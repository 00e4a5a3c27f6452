"""Gold model DAG tests: build all 20 models over fixture-derived silver
and assert the reference's dbt-test invariants (SURVEY §5.3-5.4):
grain uniqueness, between_0_and_100, non_negative, and the
gold_coverage_audit reconciliation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import dims, silver
from tagmarshal_data_lakehouse_spark.gold import build_all
from tagmarshal_data_lakehouse_spark.sources import bronze

from . import fixtures_gen


@pytest.fixture(scope="module")
def gold_models(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gold_bronze")
    json_dir = d / "json_plain"
    json_dir.mkdir()
    fixtures_gen.write_plain_json(str(json_dir / "rounds.json"))
    mongo_dir = d / "json_mongo"
    mongo_dir.mkdir()
    fixtures_gen.write_mongo_json(str(mongo_dir / "rounds.json"))
    csv_dir = d / "csv_ragged"
    fixtures_gen.write_ragged_csvs(str(csv_dir))

    parts = []
    for sub, course in [("json_plain", "americanfalls"), ("json_mongo", "mongocourse"), ("csv_ragged", "csvcourse")]:
        raw, fmt = bronze.read_rounds(spark, str(d / sub))
        parts.append(silver.transform_rounds(raw, fmt, course, "2024-01-16", None))
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionByName(p, allowMissingColumns=True)
    fact = fact.cache()

    topo = dims.topology_to_df(spark, dims.infer_topology(fact))
    return build_all(spark, fact, topo), fact


def test_all_models_build(gold_models):
    built, _ = gold_models
    assert len(built) == 20
    for name, df in built.items():
        assert df.count() >= 0, name


def test_fact_rounds_grain_unique(gold_models):
    built, _ = gold_models
    fr = built["fact_rounds"]
    assert fr.count() == fr.select("course_id", "round_id").distinct().count()


def test_fact_rounds_values(gold_models):
    built, fact = gold_models
    fr = built["fact_rounds"]
    # fix counts reconcile with non-padding silver rows
    silver_np = fact.filter(~F.col("is_location_padding")).count()
    gold_sum = fr.agg(F.sum("fix_count")).first()[0]
    assert gold_sum == silver_np
    # non_negative ported dbt test
    bad = fr.filter(
        (F.col("fix_count") < 0)
        | (F.col("projected_fix_count") < 0)
        | (F.col("low_battery_fix_count") < 0)
    ).count()
    assert bad == 0


def test_rates_between_0_and_1(gold_models):
    built, _ = gold_models
    fr = built["fact_rounds"]
    for c in ["projected_rate", "problem_rate", "cached_rate", "ts_missing_rate"]:
        bad = fr.filter((F.col(c) < 0) | (F.col(c) > 1)).count()
        assert bad == 0, c


def test_data_quality_pct_between_0_and_100(gold_models):
    built, _ = gold_models
    dq = built["data_quality_overview"]
    pct_cols = [c for c in dq.columns if c.startswith("pct_")]
    assert pct_cols
    cond = None
    for c in pct_cols:
        t = (F.col(c) < 0) | (F.col(c) > 100)
        cond = t if cond is None else (cond | t)
    assert dq.filter(cond).count() == 0


def test_seasonality_pct_sums_to_100(gold_models):
    built, _ = gold_models
    bym = built["course_rounds_by_month"]
    sums = bym.groupBy("course_id").agg(F.sum("pct_total").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 100.0) < 0.5, r


def test_coverage_audit_reconciles(gold_models):
    """The reference's audit-by-construction: silver counts must match
    gold model counts per course (gold_coverage_audit.sql)."""
    built, _ = gold_models
    audit = built["gold_coverage_audit"].collect()
    assert audit
    for r in audit:
        assert r["silver_non_padding_rows"] == r["gold_fact_rounds_sum_fix_count"], r["course_id"]
        assert r["silver_distinct_rounds_non_padding"] == r["gold_fact_rounds_distinct_rounds"], r["course_id"]
        assert r["gold_rounds_by_month_sum_rounds"] == r["gold_fact_rounds_distinct_rounds"], r["course_id"]
        assert r["gold_rounds_by_weekday_sum_rounds"] == r["gold_fact_rounds_distinct_rounds"], r["course_id"]
        assert r["gold_dim_course_present"] == 1, r["course_id"]


def test_dim_round_timestamp_invariant(gold_models):
    """ts_missing_rows counts rows where fix_timestamp IS NULL — the
    enforced invariant is_timestamp_missing = (fix_timestamp IS NULL)."""
    built, fact = gold_models
    silver_null_ts = fact.filter(F.col("fix_timestamp").isNull()).count()
    dr_sum = built["dim_round"].agg(F.sum("ts_missing_rows")).first()[0]
    assert dr_sum == silver_null_ts


def test_global_overview_single_row(gold_models):
    built, fact = gold_models
    go = built["global_overview"]
    rows = go.collect()
    assert len(rows) == 1
    assert rows[0]["total_rows"] == fact.filter(F.col("course_id").isNotNull()).count()
    assert rows[0]["courses"] == 3


def test_hole_performance_unit_names(gold_models):
    built, _ = gold_models
    hp = built["fact_round_hole_performance"]
    named = hp.filter(F.col("course_unit").isNotNull()).count()
    assert named > 0  # topology join attaches unit names
