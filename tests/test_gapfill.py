"""Gap-fill semantics pinned against hand-computed values: the
two-engine oracle proves Spark==DuckDB, this proves both == the math."""

from __future__ import annotations

import datetime


def test_gapfill_locf_and_linear_interpolation(spark, tmp_path):
    from tagmarshal_data_lakehouse_spark.queries.events_ops import _gapfill_sql

    # one type, hours 10:00 (value 4.0), 13:00 (value 10.0) -> gaps at 11, 12
    rows = [
        (1, datetime.datetime(2024, 5, 1, 10, 15), 7, "view", 4.0, None),
        (2, datetime.datetime(2024, 5, 1, 13, 45), 7, "view", 10.0, None),
    ]
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("events")
    try:
        out = {
            r["bucket_hour"].hour: r
            for r in spark.sql(_gapfill_sql("spark")).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
        # this test shadowed the testdata 'events' view: clear the
        # load_views idempotency marker so later tests re-register
        try:
            spark.conf.unset("spark.graft.views.loaded")
        except Exception:  # noqa: BLE001
            pass
    assert sorted(out) == [10, 11, 12, 13]
    assert not out[10]["is_gap"] and out[11]["is_gap"] and out[12]["is_gap"]
    # LOCF carries 4.0 through the gap
    assert out[11]["value_locf"] == 4.0 and out[12]["value_locf"] == 4.0
    # linear interp between (10:00, 4.0) and (13:00, 10.0): 6.0 at 11, 8.0 at 12
    assert out[11]["value_interp"] == 6.0
    assert out[12]["value_interp"] == 8.0
    assert out[10]["value_interp"] == 4.0 and out[13]["value_interp"] == 10.0
    assert out[10]["n_events"] == 1 and out[11]["n_events"] == 0
