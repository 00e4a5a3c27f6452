"""Incremental gold refresh: partition-scoped rebuild must be
indistinguishable from a full rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import silver
from tagmarshal_data_lakehouse_spark.gold.models import (
    GoldBuilder,
    incremental_update,
)
from tagmarshal_data_lakehouse_spark.sources import bronze
from tagmarshal_data_lakehouse_spark.storage import Lakehouse

from . import fixtures_gen


def _silver_fact(spark, tmp_path, courses):
    d = tmp_path / "bronze"
    d.mkdir()
    fixtures_gen.write_plain_json(str(d / "rounds.json"))
    raw, fmt = bronze.read_rounds(spark, str(d))
    parts = [
        silver.transform_rounds(raw, fmt, c, "2024-01-16", None) for c in courses
    ]
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionByName(p, allowMissingColumns=True)
    return fact


@pytest.fixture(scope="module")
def lake_with_gold(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("inc_gold")
    lake = Lakehouse(spark, str(tmp / "warehouse"))
    fact = _silver_fact(spark, tmp, ["course_a", "course_b", "course_c"])
    lake.replace_partitions(
        "silver.fact_telemetry_event", fact, ["course_id", "ingest_date", "event_date"]
    )
    # full build, partitioned by course_id where the model carries it
    models = GoldBuilder(spark).build(lake.read("silver.fact_telemetry_event"))
    for name, df in models.items():
        part = ["course_id"] if "course_id" in df.columns else None
        lake.overwrite(f"gold.{name}", df, partition_by=part)
    return lake, sorted(models)


def _snapshot(spark, lake, names):
    out = {}
    for name in names:
        df = lake.read(f"gold.{name}")
        out[name] = sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((v is None, str(v)) for v in t),
        )
    return out


def test_incremental_noop_refresh_matches_full(spark, lake_with_gold):
    lake, names = lake_with_gold
    before = _snapshot(spark, lake, names)
    written = incremental_update(spark, lake, ["course_b"])
    assert set(written) == set(names)
    after = _snapshot(spark, lake, names)
    assert after == before  # same silver -> refresh must be a no-op


def test_incremental_absorbs_new_partition(spark, lake_with_gold, tmp_path):
    lake, names = lake_with_gold
    # new ingest: course_b gets a second ingest_date with re-tagged rounds
    extra = _silver_fact(spark, tmp_path, ["course_b"]).withColumn(
        "ingest_date", F.lit("2024-01-17")
    ).withColumn("round_id", F.concat(F.col("round_id"), F.lit("_v2")))
    lake.replace_partitions(
        "silver.fact_telemetry_event", extra, ["course_id", "ingest_date", "event_date"]
    )

    incremental_update(spark, lake, ["course_b"])
    inc = _snapshot(spark, lake, names)

    # ground truth: full rebuild from the same silver state
    models = GoldBuilder(spark).build(lake.read("silver.fact_telemetry_event"))
    for name, df in models.items():
        part = ["course_id"] if "course_id" in df.columns else None
        lake.overwrite(f"gold.{name}", df, partition_by=part)
    full = _snapshot(spark, lake, names)
    assert inc == full


def test_incremental_leaves_untouched_courses_alone(spark, lake_with_gold):
    lake, _ = lake_with_gold
    fr = lake.read("gold.fact_rounds")
    a_before = fr.filter(F.col("course_id") == "course_a").count()
    incremental_update(spark, lake, ["course_c"])
    a_after = (
        lake.read("gold.fact_rounds").filter(F.col("course_id") == "course_a").count()
    )
    assert a_before == a_after and a_before > 0
