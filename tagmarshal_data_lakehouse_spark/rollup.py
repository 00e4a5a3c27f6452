"""Incrementally-maintained materialized rollup with mergeable sketch
state — the continuous-aggregate counterpart of the one-shot
`events_hll_rollup` registry query.

A continuous pipeline cannot rescan history to answer "distinct users
per (event_type, hour)": at 100 TB the fact table is append-only and
each refresh must touch ONLY the new batch. That requires every stored
aggregate to be MERGEABLE:

- counts / sums merge by addition;
- distinct counts CANNOT be merged from counts — the rollup stores the
  Datasketches HLL *sketch binary* per group and merges batches with
  HLL_UNION_AGG, which is lossless (union-of-batch-sketches is byte-for-
  byte the sketch of the unioned input, pinned in tests);
- estimates are derived at READ time (`with_estimates`), never stored,
  so coarser re-aggregation (day / type / global) stays available from
  the same state.

Refresh discipline (the part correctness at scale depends on):
- each batch carries an id; applied ids live in a tiny side log, and a
  replayed id is a no-op — counters are additive, so at-least-once
  delivery without the log would silently double-count (unlike the
  idempotent-by-construction partition rewrites in `storage.py`);
- the merge is one distributed union + groupBy over (existing rollup ∪
  batch partial): the shuffle carries kilobyte sketches, never user
  ids; the batch is pre-aggregated map-side before it ever meets the
  (small) rollup state;
- the new state is written to a shadow directory and swapped in with
  `Lakehouse._swap_in` — a crashed refresh leaves the old state intact,
  and the applied-id log is updated only AFTER the swap, so a crash
  between merge and log replays the batch instead of dropping it.

Reference analogue: the reference materializes gold aggregates by full
rebuild (dbt models); this module is the engine-scope extension a
streaming/continuous deployment of those models needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage import Lakehouse

HOUR_BUCKET_NTZ = F.expr("MAKE_TIMESTAMP_NTZ(YEAR(ts), MONTH(ts), DAY(ts), HOUR(ts), 0, 0)")


# -- mergeable fixed-bin histogram (quantile sketch) ----------------------
#
# percentile_approx cannot live in a materialized rollup: its internal
# QuantileSummaries state is not exposed, so a stored percentile can
# neither absorb a new batch nor re-aggregate to a coarser grain.  The
# mergeable counterpart is the oldest sketch there is — a fixed-boundary
# histogram: bucket counts merge by elementwise ADDITION (exact,
# associative, order-independent), and quantiles are derived at read
# time by walking the cumulative counts, so the same stored state
# answers p50/p95/p99 at any later grain with no fact rescan.  Bucket
# boundaries are part of the schema contract (same lo/hi/n everywhere or
# states don't merge); the estimate error is bounded by one bucket
# width, pinned in tests/test_sketch_rollups.py.


def hist_bucket(col: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """0-based fixed-width bucket index, clamped to [0, n_buckets-1] so
    out-of-range values land in the edge buckets instead of vanishing."""
    width = (hi - lo) / n_buckets
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(width)).cast("bigint")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))


def hist_agg(col: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """Aggregate expression: array<bigint> of per-bucket counts.

    One conditional SUM per bucket — every term combines map-side, so
    the shuffled state per group is exactly `n_buckets` longs regardless
    of input size (the mergeable-at-scale shape)."""
    b = hist_bucket(col, lo, hi, n_buckets)
    return F.array(
        *[
            F.sum(F.when(b == i, F.lit(1)).otherwise(F.lit(0))).cast("bigint")
            for i in range(n_buckets)
        ]
    )


def hist_merge(col: Column | str, n_buckets: int) -> Column:
    """Aggregate expression merging already-built histograms upward
    (elementwise sum) — the re-aggregation path for coarser grains."""
    h = F.col(col) if isinstance(col, str) else col
    zero = F.array_repeat(F.lit(0).cast("bigint"), n_buckets)
    return F.aggregate(
        F.collect_list(h), zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    )


def hist_quantile(
    col: Column | str, lo: float, hi: float, n_buckets: int, q: float
) -> Column:
    """Read-time quantile estimate from a stored histogram: find the
    bucket where the cumulative count crosses q*total, linearly
    interpolate inside it.  Pure expression tree (no UDF); NULL on an
    empty histogram.  |estimate - exact nearest-rank quantile| is at
    most one bucket width: both lie in the crossing bucket."""
    h = F.col(col) if isinstance(col, str) else col
    width = (hi - lo) / n_buckets
    zero = F.lit(0).cast("bigint")
    total = F.aggregate(h, zero, lambda a, x: a + x)
    target = F.lit(q) * total.cast("double")
    cum = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.aggregate(F.slice(h, F.lit(1), i + F.lit(1)), zero, lambda a, x: a + x),
    )
    first_ge = F.filter(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.element_at(cum, i + F.lit(1)).cast("double") >= target,
    )
    idx = F.element_at(first_ge, 1)  # 0-based crossing bucket
    cum_below = F.when(idx == 0, zero).otherwise(F.element_at(cum, idx))
    in_bucket = F.element_at(h, idx + F.lit(1))
    frac = (target - cum_below.cast("double")) / in_bucket.cast("double")
    est = F.lit(lo) + F.lit(width) * (idx.cast("double") + frac)
    return F.when(total > 0, est)


class SketchRollup:
    """Materialized (event_type, bucket_hour) rollup of an events-shaped
    stream: exact `n_events`, exact decimal `value_sum`, and a mergeable
    HLL `user_sketch` per group."""

    def __init__(
        self,
        lake: Lakehouse,
        table: str = "rollup_events_hourly",
        lg_k: int = 14,
        hist_lo: float = 0.0,
        hist_hi: float = 500.0,
        hist_buckets: int = 50,
    ):
        self.lake = lake
        self.table = table
        self.log_table = table + "__applied"
        self.lg_k = lg_k
        # fixed histogram boundaries are part of the state's schema
        # contract: every batch and every stored row must use the same
        # (lo, hi, n) or the elementwise merge is meaningless
        self.hist_lo = hist_lo
        self.hist_hi = hist_hi
        self.hist_buckets = hist_buckets

    # -- state -----------------------------------------------------------

    def applied_batch_ids(self) -> set[str]:
        if not self.lake.exists(self.log_table):
            return set()
        return {r["batch_id"] for r in self.lake.read(self.log_table).collect()}

    def read(self) -> DataFrame:
        return self.lake.read(self.table)

    def with_estimates(self, rollup: DataFrame | None = None) -> DataFrame:
        """Derive the user-count estimate column; state keeps sketches."""
        r = rollup if rollup is not None else self.read()
        lo, hi, n = self.hist_lo, self.hist_hi, self.hist_buckets
        return (
            r.withColumn(
                "approx_users",
                F.expr("CAST(HLL_SKETCH_ESTIMATE(user_sketch) AS BIGINT)"),
            )
            .withColumn("value_p50", hist_quantile("value_hist", lo, hi, n, 0.5))
            .withColumn("value_p95", hist_quantile("value_hist", lo, hi, n, 0.95))
        )

    # -- refresh ---------------------------------------------------------

    def _partial(self, batch: DataFrame) -> DataFrame:
        # value_sum as DECIMAL(30,6): exact, associative, and therefore
        # merge-order independent — a double sum would drift with the
        # merge history. value is µ-scale telemetry; 6 fractional digits
        # match the dsum() discipline used by the oracle-checked queries.
        return (
            batch.withColumn("bucket_hour", HOUR_BUCKET_NTZ)
            .groupBy("event_type", "bucket_hour")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.col("value").cast("decimal(30,6)")).alias("value_sum"),
                F.expr(f"HLL_SKETCH_AGG(user_id, {self.lg_k})").alias("user_sketch"),
                hist_agg(
                    F.col("value"), self.hist_lo, self.hist_hi, self.hist_buckets
                ).alias("value_hist"),
            )
        )

    def refresh(self, batch: DataFrame, batch_id: str) -> bool:
        """Merge one batch into the rollup; returns False on a replay
        (already-applied batch_id — state untouched)."""
        if batch_id in self.applied_batch_ids():
            return False
        partial = self._partial(batch)
        if self.lake.exists(self.table):
            stored = self.lake.read(self.table)
            if "value_hist" not in stored.columns:
                # Migration: rollup state written before the value_hist
                # column existed. Backfill an all-zero histogram so the
                # merge schema aligns — the additive-state contract then
                # holds forward, but quantile estimates cover only
                # post-migration batches (the pre-migration value mass
                # was never histogrammed and cannot be reconstructed
                # without a fact rescan; value_sum/n_events/user_sketch
                # remain exact/mergeable across the boundary).
                stored = stored.withColumn(
                    "value_hist",
                    F.array_repeat(F.lit(0).cast("bigint"), self.hist_buckets),
                )
            merged = (
                stored
                .unionByName(partial)
                .groupBy("event_type", "bucket_hour")
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("value_sum").cast("decimal(30,6)").alias("value_sum"),
                    F.expr("HLL_UNION_AGG(user_sketch)").alias("user_sketch"),
                    hist_merge("value_hist", self.hist_buckets).alias("value_hist"),
                )
            )
            shadow = self.table + "__tmp"
            self.lake.overwrite(shadow, merged)
            self.lake._swap_in(self.table, shadow)
        else:
            self.lake.overwrite(self.table, partial)
        self._log_applied(batch_id)
        return True

    def _log_applied(self, batch_id: str) -> None:
        spark = SparkSession.getActiveSession()
        row = spark.createDataFrame([(batch_id,)], "batch_id string")
        if self.lake.exists(self.log_table):
            self.lake.merge_upsert(self.log_table, row, keys=["batch_id"])
        else:
            self.lake.overwrite(self.log_table, row)

    # -- reads at coarser grain ------------------------------------------

    def by_event_type(self) -> DataFrame:
        """Re-aggregate the stored state to event_type grain — sketches
        merge upward, so no fact rescan at any resolution."""
        return (
            self.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_hourly_buckets"),
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("value_sum").cast("decimal(30,6)").alias("value_sum"),
                F.expr(
                    "CAST(HLL_SKETCH_ESTIMATE(HLL_UNION_AGG(user_sketch)) AS BIGINT)"
                ).alias("approx_users"),
                hist_merge("value_hist", self.hist_buckets).alias("value_hist"),
            )
            .withColumn(
                "value_p50",
                hist_quantile(
                    "value_hist", self.hist_lo, self.hist_hi, self.hist_buckets, 0.5
                ),
            )
            .withColumn(
                "value_p95",
                hist_quantile(
                    "value_hist", self.hist_lo, self.hist_hi, self.hist_buckets, 0.95
                ),
            )
        )
