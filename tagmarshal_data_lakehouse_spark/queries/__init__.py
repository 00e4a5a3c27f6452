"""Named-query registry.

The reference keeps its analytic surface as named SQL strings
(dashboard/utils/queries.py, pipeline/queries/**). This engine keeps the
same idea but each query is a *builder*: a function (spark, sf_dir) ->
DataFrame, declared with an optional ANSI-SQL oracle equivalent (runnable
by DuckDB on the same parquet files) used by the correctness harness.

Determinism contract (so a value-hash against the oracle matches):
- every computed column is aliased identically in builder and oracle;
- double aggregations go through exact DECIMAL sums and are converted
  back to double with identical expression shape on both sides (IEEE ops
  on identical inputs are bit-identical);
- ties in top-k / dedup windows are broken by a unique key;
- approximate aggregates (percentile_approx, minhash, …) never appear in
  oracle-checked outputs — exact forms are checked, approximate forms are
  exposed as separate rows-only queries (the 100 TB scale path).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class Query:
    """One registry entry: a Spark builder + optional DuckDB oracle SQL."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def load_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register the testdata parquet tables as temp views.

    Reading straight from parquet keeps Catalyst's filter pushdown and
    column pruning live (the scan only materializes what each query
    projects — check `.explain` for PushedFilters/ReadSchema).

    Must work under ANY externally-built SparkSession, not only the
    package's own session factory, and must yield the SAME `events.ts`
    type everywhere. The testdata has shipped it two ways:

    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — the current
      shape. Read as TIMESTAMP_NTZ (inferTimestampNTZ set for the
      registration reads and restored after, so a session configured
      otherwise agrees without this function permanently mutating that
      session's conf) and KEPT NTZ: naive on the
      Spark side exactly as DuckDB's naive TIMESTAMP, so oracle
      comparisons never depend on the session timezone. Queries use only
      NTZ-safe functions over it (TIMESTAMPDIFF / DATE_TRUNC — never
      unix_micros, which requires LTZ).
    - parquet TIMESTAMP(NANOS), which a plain session refuses to read
      (PARQUET_TYPE_ILLEGAL; all 47 round-1 rows). nanosAsLong is a
      runtime-settable SQL conf, so set it here rather than relying on
      session-build time, then rebuild µs timestamps from the long.

    Each table is also failure-isolated: one unreadable table must not
    take down queries that never touch it.
    """
    # Registration is idempotent per (session, sf_dir, tables): every
    # registry builder calls load_views, so without this marker a
    # multi-query run (bench.py, the correctness sweep) re-reads 10
    # parquet footers per query. Temp views are just named logical plans
    # — re-registering identical ones buys nothing.
    marker = f"{sf_dir}|{','.join(tables)}"
    try:
        if spark.conf.get("spark.graft.views.loaded", "") == marker:
            return
    except Exception:  # noqa: BLE001 — conf access must never fail a query
        pass

    # Runtime-settable; makes TIMESTAMP(NANOS) columns readable as long
    # (then rebuilt as µs timestamps below) under any session. Left set
    # (not restored): it only affects files physically containing
    # TIMESTAMP(NANOS), which a plain session cannot read AT ALL, so it
    # cannot change the inferred type of any column the caller could
    # otherwise read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # TIMESTAMP(MICROS, adjusted=false) must read as NTZ under every
    # session so query semantics don't depend on who built the session.
    # The conf is set for the registration reads only and RESTORED in
    # the finally below: schema inference happens eagerly at read(), so
    # the registered views keep NTZ (verified under a restored-false
    # session), while the caller's own later unadjusted-UTC parquet
    # reads keep the semantics their session configured. (A per-read
    # parquet reader option would be cleaner, but Spark silently ignores
    # an `inferTimestampNTZ` option — only the conf is honored.)
    ntz_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    try:
        prior_ntz: str | None = spark.conf.get(ntz_key)
    except Exception:  # noqa: BLE001 — unreadable: restore by unsetting
        prior_ntz = None
    spark.conf.set(ntz_key, "true")

    errors: dict[str, Exception] = {}
    try:
        _register_tables(spark, sf_dir, tables, errors)
    finally:
        if prior_ntz is not None:
            spark.conf.set(ntz_key, prior_ntz)
        else:
            # The pre-read raised, i.e. the conf had no readable value —
            # leaving our "true" behind would permanently mutate the
            # caller's session; unset returns the key to its default.
            try:
                spark.conf.unset(ntz_key)
            except Exception:  # noqa: BLE001 — never fail a query on restore
                pass
    if errors and len(errors) == len(tables):
        # Nothing loaded at all — surface the first real failure.
        raise next(iter(errors.values()))
    if not errors:
        spark.conf.set("spark.graft.views.loaded", marker)


def _register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...],
    errors: dict[str, Exception],
) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for t in tables:
        try:
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            if t == "events" and isinstance(df.schema["ts"].dataType, LongType):
                # TIMESTAMP(NANOS) read as long (nanosAsLong); the data is
                # µs-precision so nanos are exact multiples of 1000 and the
                # floor division is lossless. DuckDB performs the same
                # ns->µs truncation when it maps this column to TIMESTAMP.
                # Built as NTZ directly (epoch + µs) so both testdata
                # vintages present one type, with no session-timezone
                # dependence anywhere on the path.
                df = df.withColumn(
                    "ts",
                    F.expr(
                        "timestampadd(MICROSECOND, ts div 1000,"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                    ),
                )
            df.createOrReplaceTempView(t)
        except Exception as exc:  # noqa: BLE001 — isolate per-table failure
            errors[t] = exc


# The correctness harness sweeps the registry in insertion order under a
# budget (rounds 2 and 3 each covered exactly the first 50 entries), so
# ordering is a coverage decision, not cosmetics. With far more registry
# entries than the budget, full driver coverage is a ROTATION, enforced
# mechanically by tests/test_registry_order.py (which computes every
# query's last driver-green round from the committed CORRECTNESS_r*.json
# artifacts, and its edited-since-green state from the oracle-text
# ledger QUERY_TEXT_HASHES.json): each round the head carries (a) the
# flagship family stripes, (b) every query that has never produced a
# driver hash row or was edited after its last green row, (c) the front
# of the stale-rotation queue (oldest green round first, horizon
# derived from the live registry size). Layout:
#   1. flagship interleave — one query per family every 4 slots, so even
#      a severely truncated sweep produces a row for every family;
#   2. the round's sweep-priority block (_SWEEP_PRIORITY, slots 13..50):
#      must-verify entries first, then the stale-rotation slice;
#   3. the tail: the rest of the stale rotation first (_STALE_TAIL —
#      next round's priority, picked up first if the budget ever grows),
#      then the families green in the most recent sweep.
# The round this head layout was designed for. The rotation gate
# (tests/test_registry_order.py) evaluates the staleness queue AS OF
# this round, so the suite stays green when the driver's next
# CORRECTNESS artifact lands before the next rotation — and a separate
# test fails loudly if this marker ever falls more than one round
# behind the artifacts (the round-5 zero-commit failure mode). Bump it
# when rotating the head.
HEAD_DESIGNED_FOR_ROUND = 13

_FLAGSHIP_INTERLEAVE = (
    "events_sessionize",
    "doc_dedup_exact",
    "tpch_q3",
    "agg_pricing_summary",
    "events_tumbling_window",
    "doc_token_stats",
    "tpch_q6",
    "window_dedup",
    "events_asof_join",
    "emb_cosine_topk",
    "tpch_q18",
    "join_multiway",
)

# Round-13 sweep priorities (38 entries; slots 13..50 of the head).
# Composition is governed by the artifact-driven standing gate in
# tests/test_registry_order.py: every oracle-backed query that has NEVER
# had a driver hash row, or whose text was edited after its last green
# row (mechanically derived from QUERY_TEXT_HASHES.json), must be here;
# the remaining slots carry the front of the stale-rotation queue
# (oldest driver-green round first); whatever the queue cannot fit this
# round leads the tail (_STALE_TAIL) and must fit entirely into NEXT
# round's priority block.
# rotate_head --round 13 (plus the round-13 registration): 240
# oracle-backed, horizon 6 (stale = green <= r07); due 39 = 1 hard
# (gold_dim_device_rollup, registered never-green this round) + 38
# stale (the r07-vintage cohort) — 38/38 slots, overflow 1
# (gold_dim_course, leading the tail); round 14's queue is that
# overflow + the 37 r08-vintage entries = 38 <= 38.
_SWEEP_PRIORITY = (
    # Round-13 registration (never-green -> hard due, must sit in the
    # sweep window): the rollup-combine dim_device, the driver-grade
    # check on gold/rollups.py's SECOND combiner (course-grain
    # COUNT(DISTINCT) merge + exact DECIMAL battery sum).
    "gold_dim_device_rollup",
    # r07-vintage cohort (crossed the horizon at round 13)
    "agg_weighted_score",
    "distinct_projection",
    "join_broadcast",
    "join_range_broadcast",
    "join_salted_skew",
    "join_semi",
    "join_anti",
    "join_coverage_audit",
    "join_share_of_total",
    "join_outlier_vs_max",
    "window_topn",
    "window_lag_transitions",
    "window_rank_dense",
    "window_running_total",
    "sort_limit_nulls_last",
    "sort_case_key",
    "union_by_name",
    "scalar_string_math",
    "scalar_json",
    "scalar_coordinates",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "doc_minhash_dedup_verdict",
    "telemetry_start_hole_distribution",
    "telemetry_avg_pace_by_hole",
    "telemetry_pace_comparison_hole",
    "telemetry_round_duration",
    "telemetry_global_overview",
    "telemetry_events_by_hour",
    "telemetry_null_correlation",
    "telemetry_missing_ts_overview",
    "gold_rounds_by_month",
    "gold_coverage_audit",
    "gold_device_health_errors",
    "gold_pace_summary_by_round",
    "gold_hole_performance",
)

# The rest of the stale rotation.  FRONT: this round's due-queue
# overflow — gold_dim_course, the one r07 stale the round-13
# registration's hard-due slot displaced (one-round lag, bounded by
# the gate).  Then the 37 r08-vintage entries that cross the staleness
# horizon at round 14 — round 14's queue is 1 + 37 = 38 <= 38 slots.
_STALE_TAIL = (
    # round-13 due-queue overflow (r07-vintage), due FIRST at round 14
    "gold_dim_course",
    # r08-vintage cohort (due at round 14)
    "window_ntile_distribution",
    "pivot_status_counts",
    "join_exists_correlated",
    "scalar_correlated_subquery",
    "explode_posexplode",
    "set_intersect_except",
    "agg_corr_regression",
    "scalar_array_family",
    "agg_string_agg",
    "window_range_frame",
    "join_full_outer",
    "agg_skew_profile",
    "scan_profile",
    "events_funnel",
    "events_dedup_exact",
    "events_time_rollup",
    "events_retention_cohorts",
    "events_anomaly_zscore",
    "doc_quality",
    "doc_lang_id",
    "doc_ngram_jaccard",
    "emb_label_stats",
    "emb_cosine_near_dups",
    "doc_train_split",
    "doc_stratified_sample",
    "gold_signal_quality_rounds",
    "gold_course_configuration",
    "gold_critical_column_gaps",
    "gold_dim_round",
    "gold_dim_device",
    "gold_global_overview",
    "gold_global_course_summary",
    "gold_global_time_patterns",
    "gold_fact_telemetry_fix",
    "telemetry_round_progression",
    "telemetry_progression_summary",
    "telemetry_nine_combinations",
)


def registry() -> dict[str, Query]:
    """Assemble the full named-query registry (see ordering note above)."""
    from . import events_ops, relational, telemetry_bridge, tpch
    from ..training import queries as training_queries

    by_name: dict[str, Query] = {}
    for qs in (
        events_ops.QUERIES,
        training_queries.QUERIES,
        tpch.QUERIES,
        relational.QUERIES,
        telemetry_bridge.QUERIES,
    ):
        for q in qs:
            if q.name in by_name:
                raise ValueError(f"duplicate query name {q.name}")
            by_name[q.name] = q

    out: dict[str, Query] = {}
    for name in _FLAGSHIP_INTERLEAVE + _SWEEP_PRIORITY + _STALE_TAIL:
        out[name] = by_name[name]
    # Tail remainder: everything verified in a recent sweep, by family.
    for qs in (
        relational.QUERIES,
        events_ops.QUERIES,
        training_queries.QUERIES,
        tpch.QUERIES,
        telemetry_bridge.QUERIES,
    ):
        for q in qs:
            out.setdefault(q.name, q)
    return out
