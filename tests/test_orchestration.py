"""Orchestration tests: registry idempotency/status transitions and the
backfill loop (discover -> ingest -> retry -> skip-on-rerun)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import orchestration as orch
from tagmarshal_data_lakehouse_spark.storage import Lakehouse

from . import fixtures_gen


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def bronze_root(tmp_path):
    root = tmp_path / "landing"
    for course, date in [("americanfalls", "2024-01-16"), ("indiancreek", "2024-01-17")]:
        d = root / f"course_id={course}" / f"ingest_date={date}"
        os.makedirs(d)
        fixtures_gen.write_plain_json(str(d / "rounds.json"))
    return str(root)


def test_registry_transitions(spark, lake):
    reg = orch.IngestionRegistry(lake)
    assert not reg.is_already_ingested("f1", "2024-01-16", "silver")
    reg.start("f1", "c1", "2024-01-16", "silver", path="/x")
    assert not reg.is_already_ingested("f1", "2024-01-16", "silver")  # running != success
    reg.complete("f1", "2024-01-16", "silver", "success", rows_processed=10)
    assert reg.is_already_ingested("f1", "2024-01-16", "silver")
    row = reg.summary().collect()[0]
    assert row["status"] == "success" and row["rows_processed"] == 10
    assert row["duration_seconds"] is not None and row["duration_seconds"] >= 0


def test_registry_retry_count_increments(spark, lake):
    reg = orch.IngestionRegistry(lake)
    reg.start("f2", "c1", "2024-01-16", "silver")
    reg.complete("f2", "2024-01-16", "silver", "failed", error_message="boom")
    reg.start("f2", "c1", "2024-01-16", "silver")
    log = reg._log().filter(F.col("filename") == "f2").collect()
    assert len(log) == 1  # unique (filename, ingest_date, layer)
    assert log[0]["retry_count"] == 1
    assert log[0]["status"] == "running"


def test_discover_and_pending(spark, lake, bronze_root):
    reg = orch.IngestionRegistry(lake)
    parts = orch.discover_bronze_partitions(bronze_root)
    assert [(c, d) for c, d, _ in parts] == [
        ("americanfalls", "2024-01-16"),
        ("indiancreek", "2024-01-17"),
    ]
    # filters
    assert len(orch.get_pending_jobs(reg, bronze_root, course_id="indiancreek")) == 1
    assert len(orch.get_pending_jobs(reg, bronze_root, start_date="2024-01-17")) == 1
    # success removes from pending
    reg.start("americanfalls_2024-01-16", "americanfalls", "2024-01-16", "silver")
    reg.complete("americanfalls_2024-01-16", "2024-01-16", "silver", "success")
    assert [(c, d) for c, d, _ in orch.get_pending_jobs(reg, bronze_root)] == [
        ("indiancreek", "2024-01-17")
    ]


def test_backfill_end_to_end_and_idempotent_rerun(spark, lake, bronze_root):
    res = orch.run_backfill(spark, lake, bronze_root)
    assert sorted(res.succeeded) == [
        ("americanfalls", "2024-01-16"),
        ("indiancreek", "2024-01-17"),
    ]
    assert not res.failed
    fact = lake.read("silver.fact_telemetry_event")
    assert fact.filter(F.col("course_id") == "americanfalls").count() > 0
    assert fact.filter(F.col("course_id") == "indiancreek").count() > 0
    n_before = fact.count()

    # rerun: nothing pending, nothing duplicated
    res2 = orch.run_backfill(spark, lake, bronze_root)
    assert not res2.succeeded and not res2.failed
    assert lake.read("silver.fact_telemetry_event").count() == n_before


def test_backfill_retries_then_fails(spark, lake, tmp_path, monkeypatch):
    """Transient (non-validation) failures get the full retry loop."""
    root = tmp_path / "badland"
    d = root / "course_id=badcourse" / "ingest_date=2024-01-18"
    os.makedirs(d)
    fixtures_gen.write_plain_json(str(d / "rounds.json"))  # passes the gate

    from tagmarshal_data_lakehouse_spark import silver as silver_mod

    def boom(*a, **k):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(silver_mod, "run_silver", boom)
    res = orch.run_backfill(spark, lake, str(root), max_retries=2)
    assert res.failed == [("badcourse", "2024-01-18")]
    reg = orch.IngestionRegistry(lake)
    log = reg._log().filter(F.col("course_id") == "badcourse").collect()
    assert len(log) == 1
    assert log[0]["status"] == "failed"
    assert log[0]["retry_count"] == 1  # second attempt incremented it
    assert log[0]["error_message"]


def test_backfill_validation_gate_fails_fast(spark, lake, tmp_path):
    """Malformed files fail AT THE DOOR (S12): registry row goes straight
    to failed with no retry attempts, and silver is never touched."""
    root = tmp_path / "badland"
    d = root / "course_id=badcourse" / "ingest_date=2024-01-18"
    os.makedirs(d)
    (d / "rounds.json").write_text("{not json at all")
    d2 = root / "course_id=badheader" / "ingest_date=2024-01-19"
    os.makedirs(d2)
    (d2 / "rounds.csv").write_text("foo,bar\n1,2\n")  # no _id/course
    res = orch.run_backfill(spark, lake, str(root), max_retries=3)
    assert sorted(res.failed) == [("badcourse", "2024-01-18"), ("badheader", "2024-01-19")]
    reg = orch.IngestionRegistry(lake)
    log = {r["course_id"]: r for r in reg._log().collect()}
    assert log["badcourse"]["status"] == "failed"
    assert log["badheader"]["status"] == "failed"
    assert log["badcourse"]["retry_count"] == 0  # no retry loop for permanent errors
    assert "required columns" in log["badheader"]["error_message"]
    assert not lake.exists("silver.fact_telemetry_event")


def test_file_hash(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    assert orch.compute_file_hash(str(p)) == "5d41402abc4b2a76b9719d911017c592"
    assert orch.compute_file_hash(str(tmp_path / "missing")) is None
