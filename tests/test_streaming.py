"""Streaming tests: file-stream silver ingest parity with batch, replay
idempotency, and watermarked window aggregations."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import silver, streaming
from tagmarshal_data_lakehouse_spark.sources import bronze
from tagmarshal_data_lakehouse_spark.storage import Lakehouse
from tagmarshal_data_lakehouse_spark.streaming.ingest import infer_bronze_schema

from . import fixtures_gen


@pytest.fixture()
def landing(tmp_path):
    root = tmp_path / "landing"
    d = root / "course_id=americanfalls" / "ingest_date=2024-01-16"
    os.makedirs(d)
    fixtures_gen.write_plain_json(str(d / "rounds.json"))
    return str(root)


def test_stream_silver_matches_batch(spark, tmp_path, landing):
    lake = Lakehouse(spark, str(tmp_path / "wh"))
    sample = f"{landing}/course_id=americanfalls/ingest_date=2024-01-16"
    schema = infer_bronze_schema(spark, sample)

    q = streaming.stream_silver(
        spark, lake, landing, schema, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = lake.read("silver.fact_telemetry_event")
    raw, fmt = bronze.read_rounds(spark, sample)
    batch = silver.transform_rounds(raw, fmt, "americanfalls", "2024-01-16", None)
    b_valid, _ = silver.split_coordinates(batch)

    assert streamed.count() == b_valid.count()
    key = ["round_id", "location_index"]
    s_keys = {tuple(r) for r in streamed.select(*key).collect()}
    b_keys = {tuple(r) for r in b_valid.select(*key).collect()}
    assert s_keys == b_keys


def test_stream_new_file_and_replay_idempotent(spark, tmp_path, landing):
    lake = Lakehouse(spark, str(tmp_path / "wh"))
    sample = f"{landing}/course_id=americanfalls/ingest_date=2024-01-16"
    schema = infer_bronze_schema(spark, sample)
    ckpt = str(tmp_path / "ckpt")

    q = streaming.stream_silver(spark, lake, landing, schema, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
        n1 = lake.read("silver.fact_telemetry_event").count()
        # second course lands while the stream runs
        d2 = f"{landing}/course_id=mirrorfalls/ingest_date=2024-01-17"
        os.makedirs(d2)
        fixtures_gen.write_plain_json(f"{d2}/rounds.json")
        q.processAllAvailable()
        fact = lake.read("silver.fact_telemetry_event")
        assert fact.filter(F.col("course_id") == "mirrorfalls").count() == n1
        n2 = fact.count()
        assert n2 == 2 * n1
    finally:
        q.stop()

    # restart from the same checkpoint: nothing reprocessed, no dupes
    q2 = streaming.stream_silver(spark, lake, landing, schema, checkpoint_dir=ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert lake.read("silver.fact_telemetry_event").count() == n2

    # fresh checkpoint (full replay): partition rewrite keeps it exact
    q3 = streaming.stream_silver(
        spark, lake, landing, schema, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    assert lake.read("silver.fact_telemetry_event").count() == n2


def _event_stream_fixture(spark, tmp_path):
    src = tmp_path / "events_src"
    os.makedirs(src)
    rows = [
        ("u1", "2024-01-01 10:05:00"),
        ("u1", "2024-01-01 10:20:00"),
        ("u1", "2024-01-01 11:10:00"),
        ("u2", "2024-01-01 10:40:00"),
        ("u2", "2024-01-01 13:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_str"]).select(
        "user_id", F.to_timestamp("ts_str").alias("ts")
    )
    df.write.mode("overwrite").parquet(str(src))
    return spark.readStream.schema(df.schema).parquet(str(src))


def test_stream_tumbling_counts(spark, tmp_path):
    stream = _event_stream_fixture(spark, tmp_path)
    agg = streaming.stream_tumbling_counts(stream, window_size="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_t"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["window_start"].hour: r["n_events"] for r in spark.table("tumbling_out").collect()}
    finally:
        q.stop()
    assert rows == {10: 3, 11: 1, 13: 1}


def test_stream_session_windows(spark, tmp_path):
    stream = _event_stream_fixture(spark, tmp_path)
    agg = streaming.stream_session_windows(stream, gap="30 minutes", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_s"))
        .start()
    )
    try:
        q.processAllAvailable()
        per_user = {}
        for r in spark.table("sessions_out").collect():
            per_user.setdefault(r["user_id"], []).append(r["n_events"])
    finally:
        q.stop()
    # u1: 10:05+10:20 merge (gap<30m), 11:10 separate; u2: two sessions
    assert sorted(per_user["u1"]) == [1, 2]
    assert sorted(per_user["u2"]) == [1, 1]
