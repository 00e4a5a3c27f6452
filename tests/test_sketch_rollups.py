"""Mergeable-sketch operators: HLL rollup mergeability + error bounds,
APPROX_TOP_K exactness below the tracking bound.

These are the rows-only registry entries `events_hll_rollup` and
`events_approx_topk`; their semantics are pinned here because sketch
binaries are engine-specific and boundary ties make top-k selection
engine-dependent — no DuckDB oracle is possible.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.queries import load_views, registry


@pytest.fixture(scope="module")
def events(spark, sf_smoke):
    load_views(spark, sf_smoke)
    return spark.table("events")


def test_hll_rollup_estimate_within_bounds(spark, sf_smoke, events):
    exact = {
        r["event_type"]: (r["n_users"], r["n_events"])
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    out = registry()["events_hll_rollup"].build(spark, sf_smoke).collect()
    assert {r["event_type"] for r in out} == set(exact)
    for r in out:
        true_users, true_events = exact[r["event_type"]]
        assert r["n_events"] == true_events  # counts are exact
        # lgK=14 standard error is ~0.81%; 5x margin for the tail
        assert abs(r["approx_users"] - true_users) <= max(3, 0.05 * true_users), (
            r["event_type"],
            r["approx_users"],
            true_users,
        )


def test_hll_union_of_buckets_equals_direct_sketch(spark, sf_smoke, events):
    """Mergeability is lossless by construction: unioning the hourly
    sketches must give EXACTLY the estimate of one whole-table sketch —
    this is the property that makes pre-aggregated sketch tables safe
    to roll up at any later resolution."""
    events.createOrReplaceTempView("events")
    merged = spark.sql(
        """
        SELECT event_type, CAST(HLL_SKETCH_ESTIMATE(HLL_UNION_AGG(sk)) AS BIGINT) AS est
        FROM (
            SELECT event_type,
                   MAKE_TIMESTAMP_NTZ(YEAR(ts), MONTH(ts), DAY(ts), HOUR(ts), 0, 0) AS h,
                   HLL_SKETCH_AGG(user_id, 14) AS sk
            FROM events GROUP BY 1, 2
        ) GROUP BY event_type
        """
    ).collect()
    direct = spark.sql(
        """
        SELECT event_type,
               CAST(HLL_SKETCH_ESTIMATE(HLL_SKETCH_AGG(user_id, 14)) AS BIGINT) AS est
        FROM events GROUP BY event_type
        """
    ).collect()
    assert {(r["event_type"], r["est"]) for r in merged} == {
        (r["event_type"], r["est"]) for r in direct
    }


def test_approx_topk_counts_exact_below_tracking_bound(spark, sf_smoke, events):
    exact_counts = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out = registry()["events_approx_topk"].build(spark, sf_smoke).collect()
    assert len(out) > 0
    by_type: dict[str, list] = {}
    for r in out:
        # distinct users per type fit maxItemsTracked=10000 at this SF,
        # so every reported count must be exact
        assert r["est_events"] == exact_counts[(r["event_type"], r["user_id"])], r
        by_type.setdefault(r["event_type"], []).append(r)
    for etype, rows in by_type.items():
        assert len(rows) == 5
        reported = sorted((r["est_events"] for r in rows), reverse=True)
        true_sorted = sorted(
            (n for (t, _), n in exact_counts.items() if t == etype), reverse=True
        )
        # the reported MULTISET of counts must equal the true top-5
        # counts (ties may swap which user is reported, never the count)
        assert reported == true_sorted[:5], (etype, reported, true_sorted[:5])


# -- incremental materialized rollup (rollup.SketchRollup) ----------------


def test_incremental_rollup_matches_single_pass(spark, sf_smoke, events, tmp_path):
    """Three-batch incremental refresh must equal the one-shot rollup:
    counters exactly, sketch estimates exactly (HLL union is lossless)."""
    from tagmarshal_data_lakehouse_spark.rollup import HOUR_BUCKET_NTZ, SketchRollup
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    roll = SketchRollup(Lakehouse(spark, str(tmp_path / "wh")))
    for i in range(3):
        assert roll.refresh(events.filter(F.col("event_id") % 3 == i), f"b{i}")

    got = {
        (r["event_type"], r["bucket_hour"]): r
        for r in roll.with_estimates().collect()
    }
    direct = {
        (r["event_type"], r["bucket_hour"]): r
        for r in events.withColumn("bucket_hour", HOUR_BUCKET_NTZ)
        .groupBy("event_type", "bucket_hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("value_sum"),
            F.expr(
                "CAST(HLL_SKETCH_ESTIMATE(HLL_SKETCH_AGG(user_id, 14)) AS BIGINT)"
            ).alias("approx_users"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for k, d in direct.items():
        assert got[k]["n_events"] == d["n_events"], k
        assert got[k]["value_sum"] == d["value_sum"], k  # decimal-exact merge
        # lossless mergeability: 3-way union == direct sketch, exactly
        assert got[k]["approx_users"] == d["approx_users"], k


def test_incremental_rollup_replay_is_noop(spark, sf_smoke, events, tmp_path):
    """At-least-once delivery: re-refreshing an applied batch_id must not
    double-count."""
    from tagmarshal_data_lakehouse_spark.rollup import SketchRollup
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    roll = SketchRollup(Lakehouse(spark, str(tmp_path / "wh")))
    batch = events.filter(F.col("event_id") % 3 == 0)
    assert roll.refresh(batch, "b0")
    before = sorted(
        roll.read().select("event_type", "bucket_hour", "n_events").collect()
    )
    assert not roll.refresh(batch, "b0")  # replay refused
    after = sorted(
        roll.read().select("event_type", "bucket_hour", "n_events").collect()
    )
    assert before == after


def test_incremental_rollup_coarser_grain_no_rescan(spark, sf_smoke, events, tmp_path):
    """Day/type re-aggregation comes from stored sketches: by_event_type
    over incremental state equals the whole-table per-type estimate."""
    from tagmarshal_data_lakehouse_spark.rollup import SketchRollup
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    roll = SketchRollup(Lakehouse(spark, str(tmp_path / "wh")))
    for i in range(2):
        roll.refresh(events.filter(F.col("event_id") % 2 == i), f"b{i}")
    got = {r["event_type"]: r for r in roll.by_event_type().collect()}
    direct = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(HLL_SKETCH_ESTIMATE(HLL_SKETCH_AGG(user_id, 14)) AS BIGINT)"
            ).alias("approx_users"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for t, d in direct.items():
        assert got[t]["n_events"] == d["n_events"]
        assert got[t]["approx_users"] == d["approx_users"]


# -- mergeable fixed-bin histogram (quantile sketch) ----------------------


def test_hist_incremental_merge_equals_one_shot(spark, sf_smoke, events, tmp_path):
    """Elementwise-addition merge is exact: the 3-batch incremental
    state's histograms must equal a one-shot hist_agg over the whole
    input, array-for-array, and each histogram's total must equal the
    group's row count (clamping loses nothing)."""
    from tagmarshal_data_lakehouse_spark.rollup import (
        HOUR_BUCKET_NTZ,
        SketchRollup,
        hist_agg,
    )
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    roll = SketchRollup(Lakehouse(spark, str(tmp_path / "wh")))
    for i in range(3):
        assert roll.refresh(events.filter(F.col("event_id") % 3 == i), f"b{i}")

    got = {
        (r["event_type"], r["bucket_hour"]): (r["value_hist"], r["n_events"])
        for r in roll.read().collect()
    }
    direct = {
        (r["event_type"], r["bucket_hour"]): r["value_hist"]
        for r in events.withColumn("bucket_hour", HOUR_BUCKET_NTZ)
        .groupBy("event_type", "bucket_hour")
        .agg(hist_agg(F.col("value"), 0.0, 500.0, 50).alias("value_hist"))
        .collect()
    }
    assert set(got) == set(direct)
    for k, (hist, n_events) in got.items():
        assert hist == direct[k], k
        assert sum(hist) == n_events, k


def test_hist_quantile_within_one_bucket_width(spark, sf_smoke, events, tmp_path):
    """Read-time quantile estimates from the merged state must sit
    within one bucket width of the exact nearest-rank quantile — the
    histogram's documented error bound — at the coarser by_event_type
    grain (re-aggregated from stored state, no fact rescan)."""
    from tagmarshal_data_lakehouse_spark.rollup import SketchRollup
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    roll = SketchRollup(Lakehouse(spark, str(tmp_path / "wh")))
    for i in range(2):
        roll.refresh(events.filter(F.col("event_id") % 2 == i), f"b{i}")

    width = (500.0 - 0.0) / 50
    exact_vals: dict[str, list[float]] = {}
    for r in events.select("event_type", "value").collect():
        exact_vals.setdefault(r["event_type"], []).append(r["value"])
    out = {r["event_type"]: r for r in roll.by_event_type().collect()}
    assert set(out) == set(exact_vals)
    import math

    for etype, vals in exact_vals.items():
        vals.sort()
        for q, col in ((0.5, "value_p50"), (0.95, "value_p95")):
            exact = vals[max(0, math.ceil(q * len(vals)) - 1)]
            est = out[etype][col]
            assert est is not None
            assert abs(est - exact) <= width, (etype, col, est, exact)


def test_refresh_migrates_pre_histogram_state(spark, sf_smoke, events, tmp_path):
    """ADVICE r5 low: rollup state written before the value_hist column
    existed must still refresh (zero-histogram backfill), with counters
    and sketches exact across the migration boundary; quantiles then
    cover only post-migration batches by documented design."""
    from tagmarshal_data_lakehouse_spark.rollup import SketchRollup
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    lake = Lakehouse(spark, str(tmp_path / "wh"))
    roll = SketchRollup(lake)
    b0 = events.filter(F.col("event_id") % 3 == 0)
    b1 = events.filter(F.col("event_id") % 3 == 1)
    assert roll.refresh(b0, "b0")

    # Simulate the legacy layout: drop value_hist from the stored state.
    legacy = lake.read(roll.table).drop("value_hist")
    shadow = roll.table + "__legacy"
    lake.overwrite(shadow, legacy)
    lake._swap_in(roll.table, shadow)
    assert "value_hist" not in lake.read(roll.table).columns

    assert roll.refresh(b1, "b1")  # must not raise AnalysisException
    got = {
        (r["event_type"], r["bucket_hour"]): r for r in roll.read().collect()
    }
    direct = {
        (r["event_type"], r["bucket_hour"]): r
        for r in roll._partial(b0.unionByName(b1)).collect()
    }
    assert set(got) == set(direct)
    for k, d in direct.items():
        assert got[k]["n_events"] == d["n_events"], k
        assert got[k]["value_sum"] == d["value_sum"], k
        # histogram counts the post-migration batch only
        assert sum(got[k]["value_hist"]) <= sum(d["value_hist"]), k
    # and the migrated state refreshes again as a normal histogrammed table
    assert roll.refresh(events.filter(F.col("event_id") % 3 == 2), "b2")
