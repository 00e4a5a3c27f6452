"""Run-summary observability: one JSON doc per silver run with the
reference's field names (etl.py:688-703), readable back as a Spark table."""

from __future__ import annotations

import json
import os

import pytest

from tagmarshal_data_lakehouse_spark import observability as obs
from tagmarshal_data_lakehouse_spark import silver
from tagmarshal_data_lakehouse_spark.storage import Lakehouse

from . import fixtures_gen


def test_obs_key():
    assert (
        obs.obs_key("silver", "course_id=a", "ingest_date=b", "run_id=r.json")
        == "silver/course_id=a/ingest_date=b/run_id=r.json"
    )


def test_write_run_summary_roundtrip(tmp_path):
    p = obs.write_run_summary(
        str(tmp_path), "silver", "r1", {"course_id": "c", "ingest_date": "2024-01-16", "valid_count": 3}
    )
    assert p.endswith("silver/course_id=c/ingest_date=2024-01-16/run_id=r1.json")
    doc = json.loads(open(p).read())
    assert doc["stage"] == "silver" and doc["run_id"] == "r1"
    assert doc["valid_count"] == 3 and doc["ts"]


def test_run_silver_emits_summary(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    fixtures_gen.write_plain_json(str(src / "rounds.json"))
    lake = Lakehouse(spark, str(tmp_path / "warehouse"))
    res = silver.run_silver(spark, lake, str(src), "americanfalls", "2024-01-16", run_id="t1")
    # the run history is itself a spark-readable table (file glob: the
    # doc carries course_id/ingest_date in-body, so partition discovery
    # would just duplicate them)
    hist = spark.read.json(os.path.join(lake.root, "observability", "silver", "*", "*", "*.json"))
    rows = hist.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["run_id"] == "t1"
    assert r["course_id"] == "americanfalls"
    assert r["ingest_date"] == "2024-01-16"
    assert r["valid_count"] == res.rows_valid
    assert r["invalid_count"] == res.rows_quarantined
    assert r["table"] == "silver.fact_telemetry_event"
    assert r["landing_uri"] == str(src)
