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


class SketchRollup:
    """Materialized (event_type, bucket_hour) rollup of an events-shaped
    stream: exact `n_events`, exact decimal `value_sum`, and a mergeable
    HLL `user_sketch` per group."""

    def __init__(
        self,
        lake: Lakehouse,
        table: str = "rollup_events_hourly",
        lg_k: int = 14,
    ):
        self.lake = lake
        self.table = table
        self.log_table = table + "__applied"
        self.lg_k = lg_k

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
        return r.withColumn(
            "approx_users", F.expr("CAST(HLL_SKETCH_ESTIMATE(user_sketch) AS BIGINT)")
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
            )
        )

    def refresh(self, batch: DataFrame, batch_id: str) -> bool:
        """Merge one batch into the rollup; returns False on a replay
        (already-applied batch_id — state untouched)."""
        if batch_id in self.applied_batch_ids():
            return False
        partial = self._partial(batch)
        if self.lake.exists(self.table):
            merged = (
                self.lake.read(self.table)
                .unionByName(partial)
                .groupBy("event_type", "bucket_hour")
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("value_sum").cast("decimal(30,6)").alias("value_sum"),
                    F.expr("HLL_UNION_AGG(user_sketch)").alias("user_sketch"),
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
            )
        )
