"""Event-stream operators in batch form (SURVEY.md §2.10 extension).

The reference is batch-only; its late-data handling is the is_cache dedup
preference.  This engine adds proper event-time operators — tumbling
windows, sessionization, funnel steps — expressed so the SAME logical
transform runs in batch (here, oracle-checked) and in Structured Streaming
(streaming/ingest.py wires readStream + watermark around the identical
column expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Query, load_views
from .relational import dsum


def _shared(name: str, sql: str, doc: str) -> Query:
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(sql)

    return Query(name=name, build=build, oracle=sql, doc=doc)


# Hour/day buckets over the NTZ ts column must never route through
# Spark's DATE_TRUNC: it implicitly casts to session-tz TIMESTAMP, so a
# timezone whose DST gap overlaps a bucket boundary shifts the bucket
# (NTZ->LTZ->render is the identity only outside gaps). These forms stay
# NTZ end-to-end under any session timezone. DuckDB's TIMESTAMP is
# already naive, so its plain DATE_TRUNC is the same function.
SPARK_HOUR_BUCKET = "MAKE_TIMESTAMP_NTZ(YEAR(ts), MONTH(ts), DAY(ts), HOUR(ts), 0, 0)"
SPARK_DAY_BUCKET = "CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ)"

_TUMBLING_SQL = f"""
SELECT {{hour_bucket}}              AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT)     AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {dsum('value')}              AS total_value
FROM events
GROUP BY 1, 2
"""

q_events_tumbling_window = Query(
    name="events_tumbling_window",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(_TUMBLING_SQL.format(hour_bucket=SPARK_HOUR_BUCKET)),
    )[1],
    oracle=_TUMBLING_SQL.format(hour_bucket="DATE_TRUNC('hour', ts)"),
    doc="Tumbling event-time window aggregate (batch form of streaming "
    "groupBy(window(ts, '1 hour')); Structured Streaming variant in "
    "streaming/ingest.py). window_start is derived tz-free "
    "(MAKE_TIMESTAMP_NTZ) so the bucket type and value are "
    "session-timezone independent.",
)

# Hopping (sliding) window: 1-hour windows advancing every 30 minutes,
# so every event belongs to exactly size/hop = 2 windows. The expansion
# is done IN-PLAN (a 2-row constant relation cross join — no shuffle,
# no UDF), then one hash aggregate at (window_start, event_type) grain
# with map-side partials; at 100 TB the cost model is "input × (size/
# hop)" rows into a combiner whose output grain is windows × types,
# exactly the batch shape of streaming groupBy(window(ts, '1 hour',
# '30 minutes')). Window starts are derived tz-free from NTZ field
# arithmetic (never via LTZ DATE_TRUNC) per the module-head note.
_HOPPING_SQL = f"""
WITH hopped AS (
    SELECT {{win_start}} AS window_start, event_type, user_id, value
    FROM events
    CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) hops
)
SELECT window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT)                AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {dsum('value')}                         AS total_value
FROM hopped
GROUP BY window_start, event_type
"""

# 30-minute floor of ts, NTZ end-to-end, minus k hops of 30 minutes.
_SPARK_HOP_START = (
    "TIMESTAMPADD(MINUTE, -30 * k, MAKE_TIMESTAMP_NTZ(YEAR(ts), MONTH(ts),"
    " DAY(ts), HOUR(ts), 30 * (MINUTE(ts) DIV 30), 0))"
)
_DUCK_HOP_START = (
    "DATE_TRUNC('hour', ts) + (minute(ts) // 30) * INTERVAL '30 minutes'"
    " - k * INTERVAL '30 minutes'"
)

q_events_hopping_window = Query(
    name="events_hopping_window",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(_HOPPING_SQL.format(win_start=_SPARK_HOP_START)),
    )[1],
    oracle=_HOPPING_SQL.format(win_start=_DUCK_HOP_START),
    doc="Hopping event-time window aggregate (batch form of streaming "
    "groupBy(window(ts, '1 hour', '30 minutes'))): each event lands in "
    "exactly 2 overlapping windows via an in-plan 2-row cross join — "
    "no shuffle before the single (window, type)-grain hash aggregate. "
    "Extends events_tumbling_window (the hop == size special case) the "
    "way Spark's own window() generalizes; Structured Streaming variant "
    "stream_hopping_counts in streaming/events.py. window_start stays "
    "TIMESTAMP_NTZ under any session timezone.",
)

q_events_sessionize = Query(
    name="events_sessionize",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            WITH gaps AS (
                SELECT user_id, ts, event_id,
                       TIMESTAMPDIFF(MICROSECOND, LAG(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_micros
                FROM events
            ), marked AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN gap_micros IS NULL OR gap_micros > 1800000000 THEN 1 ELSE 0 END AS is_session_start
                FROM gaps
            ), sessions AS (
                SELECT user_id, ts, event_id,
                       SUM(is_session_start) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
                FROM marked
            )
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   CAST(TIMESTAMPDIFF(MICROSECOND, MIN(ts), MAX(ts)) AS BIGINT) AS duration_micros
            FROM sessions
            GROUP BY user_id, session_seq
            """
        ),
    )[1],
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_micros
            FROM events
        ), marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN gap_micros IS NULL OR gap_micros > 1800000000 THEN 1 ELSE 0 END AS is_session_start
            FROM gaps
        ), sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(is_session_start) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM marked
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_micros
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30-min gap): LAG + running-SUM session "
    "ids — batch equivalent of session_window/applyInPandasWithState "
    "(SURVEY §2.5 W3 lag idiom at scale).",
)

q_events_funnel = _shared(
    "events_funnel",
    """
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS first_signup,
           MIN(CASE WHEN event_type = 'view'     THEN ts END) AS first_view,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
    FROM events
    GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT)                                   AS n_users,
       CAST(COUNT(first_signup) AS BIGINT)                        AS n_signed_up,
       CAST(COUNT(CASE WHEN first_view > first_signup THEN 1 END) AS BIGINT) AS n_viewed_after_signup,
       CAST(COUNT(CASE WHEN first_purchase > first_signup THEN 1 END) AS BIGINT) AS n_purchased_after_signup
FROM per_user
""",
    "Funnel: per-user conditional MIN timestamps then step counts — the "
    "min-over-filter idiom (SURVEY §2.4 A2/A5 composition).",
)

q_events_dedup_exact = Query(
    name="events_dedup_exact",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_raw,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(COUNT(*) - COUNT(DISTINCT CONCAT(CAST(user_id AS STRING), ':',
                        CAST(ts AS STRING))) AS BIGINT) AS n_dup_user_instants
            FROM events
            GROUP BY event_type
            """
        ),
    )[1],
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_raw,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(*) - COUNT(DISTINCT CONCAT(CAST(user_id AS VARCHAR), ':',
                    CAST(epoch_us(ts) AS VARCHAR))) AS BIGINT) AS n_dup_user_instants
        FROM events
        GROUP BY event_type
    """,
    doc="Exact duplicate detection on a composite key — grain-contract audit "
    "(SURVEY §5.3; reference duplicate_round_fix_timestamp.sql:1-18).",
)


q_events_asof_join = Query(
    name="events_asof_join",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            # As-of join, Spark-first: instead of a per-row inequality
            # probe (which Spark would plan as a quadratic non-equi
            # join), tag both sides, union, and carry the click state
            # forward with LAST(ignore nulls) over one user-partitioned
            # ordered window. One shuffle on user_id, linear scan — the
            # canonical distributed as-of plan. side=0 sorts clicks
            # before an equal-ts purchase, giving ASOF's >= semantics;
            # equal-ts clicks are deduped to the max event_id first so
            # both engines pick the same row.
            """
            WITH clicks AS (
                SELECT user_id, ts, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
            ), tagged AS (
                SELECT user_id, ts, 0 AS side,
                       CAST(NULL AS BIGINT) AS event_id,
                       CAST(NULL AS DOUBLE) AS purchase_value,
                       value AS click_value, ts AS click_ts
                FROM clicks WHERE rn = 1
                UNION ALL
                SELECT user_id, ts, 1 AS side, event_id, value,
                       CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP_NTZ)
                FROM events WHERE event_type = 'purchase'
            ), carried AS (
                SELECT user_id, ts, side, event_id, purchase_value,
                       LAST(click_value, true) OVER (
                           PARTITION BY user_id ORDER BY ts, side
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS last_click_value,
                       LAST(click_ts, true) OVER (
                           PARTITION BY user_id ORDER BY ts, side
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS last_click_ts
                FROM tagged
            )
            SELECT event_id, user_id, ts AS purchase_ts, purchase_value,
                   last_click_ts, last_click_value
            FROM carried WHERE side = 1
            """
        ),
    )[1],
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ), c AS (
            SELECT user_id, ts, value FROM clicks WHERE rn = 1
        ), p AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
               p.value AS purchase_value,
               c.ts AS last_click_ts, c.value AS last_click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join (most recent click at or before each purchase, per "
    "user): union-and-carry with LAST(ignore nulls) over one ordered "
    "window — one shuffle, linear scan, no quadratic inequality join; "
    "oracle is DuckDB's native ASOF JOIN.",
)

q_events_approx_sketches = Query(
    name="events_approx_sketches",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT event_type,
                   CAST(APPROX_COUNT_DISTINCT(user_id) AS BIGINT) AS approx_users,
                   APPROX_PERCENTILE(value, 0.5)  AS p50_value,
                   APPROX_PERCENTILE(value, 0.95) AS p95_value
            FROM events
            GROUP BY event_type
            """
        ),
    )[1],
    # HLL and t-digest estimates are engine-specific by construction;
    # tests bound the relative error against the exact forms instead
    # (test_sampling_asof.py).
    oracle=None,
    doc="Sketch aggregates — HyperLogLog distinct + approximate "
    "percentiles: the constant-memory per-group scale path beside the "
    "exact agg_percentile/distinct_projection baselines (rows-only; "
    "error bounds pytest-checked).",
)


_TIME_ROLLUP_SQL = """
SELECT CASE
         WHEN GROUPING(bucket_day) = 0 AND GROUPING(bucket_hour) = 1 THEN 'day'
         WHEN GROUPING(bucket_hour) = 0 THEN 'hour'
       END AS resolution,
       COALESCE(bucket_hour, bucket_day) AS bucket,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM (SELECT event_type, value,
             {hour_bucket} AS bucket_hour,
             {day_bucket} AS bucket_day
      FROM events)
GROUP BY GROUPING SETS ((bucket_hour, event_type), (bucket_day, event_type))
"""

q_events_time_rollup = Query(
    name="events_time_rollup",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            _TIME_ROLLUP_SQL.format(
                hour_bucket=SPARK_HOUR_BUCKET, day_bucket=SPARK_DAY_BUCKET
            )
        ),
    )[1],
    # DuckDB's TIMESTAMP is already naive — plain DATE_TRUNC there is the
    # same tz-free function the MAKE_TIMESTAMP_NTZ forms are on Spark.
    oracle=_TIME_ROLLUP_SQL.format(
        hour_bucket="DATE_TRUNC('hour', ts)",
        day_bucket="DATE_TRUNC('day', ts)",
    ),
    doc="Multi-resolution time-bucket rollup (hypertable continuous-aggregate "
    "shape): hour and day materializations from ONE scan via GROUPING SETS "
    "— Spark expands the sets inside a single Expand+HashAggregate, so the "
    "100 TB fact is read once for every resolution, not once per "
    "resolution. Buckets are derived tz-free (MAKE_TIMESTAMP_NTZ / "
    "DATE-cast) so both resolutions COALESCE into one NTZ column with no "
    "session-timezone dependence.",
)


q_events_anomaly_zscore = _shared(
    "events_anomaly_zscore",
    f"""
WITH stats AS (
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE)       AS n,
           {dsum('value')}                AS sx,
           {dsum('value * value', 4, 28)} AS sxx
    FROM events GROUP BY event_type
), scored AS (
    SELECT e.event_type,
           (e.value - s.sx / s.n)
             / SQRT(GREATEST(s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n), 1.0e-12)) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)             AS n_events,
       CAST(COUNT_IF(ABS(z) > 3) AS BIGINT) AS n_anomalous,
       ROUND(MAX(ABS(z)), 6)                AS max_abs_z
FROM scored
GROUP BY event_type
""",
    "Z-score anomaly detection per event type: moments from exact decimal "
    "sums (deterministic on any partitioning — +,-,*,/ and SQRT are "
    "IEEE-pinned given identical inputs, unlike built-in STDDEV over "
    "doubles), per-group stats broadcast back over the fact (tiny side), "
    "then one re-aggregation. Two scans of the fact, zero wide shuffles "
    "of it — the monitoring primitive behind telemetry outlier alerts.",
)


_COHORT_SPARK = """
WITH firsts AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_date FROM events
)
SELECT CAST(f.cohort_date AS TIMESTAMP_NTZ) AS cohort_ts,
       CAST(DATEDIFF(a.activity_date, f.cohort_date) AS INT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN firsts f ON a.user_id = f.user_id
GROUP BY f.cohort_date, day_offset
"""

q_events_retention_cohorts = Query(
    name="events_retention_cohorts",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(_COHORT_SPARK),
    )[1],
    oracle=_COHORT_SPARK.replace(
        "DATEDIFF(a.activity_date, f.cohort_date)",
        "date_diff('day', f.cohort_date, a.activity_date)",
    ).replace("TIMESTAMP_NTZ", "TIMESTAMP"),
    doc="Retention cohort matrix: users keyed to their first-seen day, "
    "counted per (cohort, day-offset) — the activation/retention report "
    "every event pipeline ships. firsts and activity both shuffle on "
    "user_id, so the join reuses the same hash partitioning (no third "
    "shuffle); cohort_ts cast to the naive timestamp type on both engines "
    "to dodge the date-object/datetime64 hash drift (same trap as "
    "scalar_datetime) without touching the session timezone. "
    "Spark DATEDIFF(end, start) = DuckDB date_diff('day', start, end) — "
    "argument order differs between engines.",
)


q_events_hll_rollup = Query(
    name="events_hll_rollup",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            f"""
            WITH hourly AS (
                SELECT event_type,
                       {SPARK_HOUR_BUCKET} AS bucket_hour,
                       HLL_SKETCH_AGG(user_id, 14) AS user_sketch,
                       COUNT(*) AS n_events
                FROM events
                GROUP BY 1, 2
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT)       AS n_hourly_buckets,
                   CAST(SUM(n_events) AS BIGINT)  AS n_events,
                   CAST(HLL_SKETCH_ESTIMATE(HLL_UNION_AGG(user_sketch)) AS BIGINT) AS approx_users
            FROM hourly
            GROUP BY event_type
            """
        ),
    )[1],
    # Datasketches HLL binary representations are engine-specific — no
    # cross-engine oracle; mergeability and error bounds are pinned in
    # tests/test_sketch_rollups.py.
    oracle=None,
    doc="Mergeable-sketch rollup — the canonical 100 TB distinct-count "
    "pattern: the fact is scanned ONCE into hourly (event_type, hour) "
    "HLL sketches (map-side partial aggregation, shuffle carries "
    "kilobyte sketches, never user ids), then any coarser resolution "
    "(day, type, global) re-aggregates SKETCHES, not raw data — unlike "
    "COUNT(DISTINCT), which cannot be rolled up from pre-aggregates at "
    "all. lgK=14 gives ~0.8% standard error at arbitrary cardinality "
    "in 16 KB per group. Tests pin that union-of-hourly equals the "
    "direct whole-table sketch exactly (mergeability is lossless by "
    "construction) and the estimate lands within bounds of exact.",
)


q_events_approx_topk = Query(
    name="events_approx_topk",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT event_type, hit.item AS user_id, CAST(hit.count AS BIGINT) AS est_events
            FROM (
                SELECT event_type, APPROX_TOP_K(user_id, 5, 10000) AS hits
                FROM events GROUP BY event_type
            )
            LATERAL VIEW EXPLODE(hits) AS hit
            """
        ),
    )[1],
    # frequency-sketch output: counts are exact while distinct items fit
    # maxItemsTracked, but boundary ties make the SELECTION engine-
    # specific — rows-only here, exactness pinned in pytest.
    oracle=None,
    doc="Heavy-hitter detection per event type via APPROX_TOP_K "
    "(frequent-items sketch): constant memory per group "
    "(maxItemsTracked bound), single scan, mergeable partials — the "
    "scale path beside the exact window_topn baseline. At 100 TB the "
    "exact form needs a full (group, item) aggregation before ranking; "
    "the sketch tracks candidates in-line and shuffles only sketch "
    "state. Tests verify every reported count against the exact "
    "aggregate (counts are exact below the tracking bound) and the "
    "returned set against the true top-k modulo ties.",
)


def _gapfill_sql(dialect: str) -> str:
    """Gap-filled hourly series with LOCF + linear interpolation (the
    TimescaleDB time_bucket_gapfill / locf / interpolate trio). One text
    per dialect: the series generator, IGNORE NULLS placement, and
    second-diff function are the only divergences."""
    if dialect == "spark":
        bucket = SPARK_HOUR_BUCKET
        series = "explode(sequence(h0, h1, interval 1 hour))"
        lv = "LAST_VALUE({e}) IGNORE NULLS"
        fv = "FIRST_VALUE({e}) IGNORE NULLS"
        sd = "TIMESTAMPDIFF(SECOND, {a}, {b})"
    else:
        bucket = "DATE_TRUNC('hour', ts)"
        series = "unnest(generate_series(h0, h1, INTERVAL 1 HOUR))"
        lv = "LAST_VALUE({e} IGNORE NULLS)"
        fv = "FIRST_VALUE({e} IGNORE NULLS)"
        sd = "DATE_DIFF('second', {a}, {b})"
    w_prec = (
        "OVER (PARTITION BY event_type ORDER BY bucket_hour "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    w_follow = (
        "OVER (PARTITION BY event_type ORDER BY bucket_hour "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    prev_val = f"{lv.format(e='total_value')} {w_prec}"
    prev_hour = f"{lv.format(e='CASE WHEN total_value IS NOT NULL THEN bucket_hour END')} {w_prec}"
    next_val = f"{fv.format(e='total_value')} {w_follow}"
    next_hour = f"{fv.format(e='CASE WHEN total_value IS NOT NULL THEN bucket_hour END')} {w_follow}"
    num = sd.format(a="prev_hour", b="bucket_hour")
    den = sd.format(a="prev_hour", b="next_hour")
    return f"""
WITH hourly AS (
    SELECT {bucket} AS bucket_hour, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dsum('value')} AS total_value
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(bucket_hour) AS h0, MAX(bucket_hour) AS h1
    FROM hourly GROUP BY event_type
), grid AS (
    SELECT event_type, {series} AS bucket_hour FROM bounds
), joined AS (
    SELECT g.event_type, g.bucket_hour, h.n_events, h.total_value
    FROM grid g LEFT JOIN hourly h
      ON h.event_type = g.event_type AND h.bucket_hour = g.bucket_hour
), carried AS (
    SELECT event_type, bucket_hour,
           (n_events IS NULL)            AS is_gap,
           COALESCE(n_events, 0)         AS n_events,
           total_value,
           {prev_val}  AS prev_val,
           {prev_hour} AS prev_hour,
           {next_val}  AS next_val,
           {next_hour} AS next_hour
    FROM joined
)
SELECT event_type, bucket_hour, is_gap, n_events,
       prev_val AS value_locf,
       CASE WHEN total_value IS NOT NULL THEN total_value
            WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
            ELSE ROUND(prev_val + (next_val - prev_val)
                       * (CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)), 6)
       END AS value_interp
FROM carried
"""


q_events_gapfill = Query(
    name="events_gapfill",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(_gapfill_sql("spark")),
    )[1],
    oracle=_gapfill_sql("duckdb"),
    doc="Gap-filled hourly series per event_type (TimescaleDB "
    "time_bucket_gapfill role): missing hours materialized from an "
    "in-plan sequence over each type's [min, max] hour range, "
    "last-observation-carried-forward, and linear interpolation from "
    "exact integer second-offsets — one hourly aggregation plus two "
    "window passes over the (type, hour) grid, never the raw events.",
)


def _islands_sql(dialect: str) -> str:
    """Gaps-and-islands over busy hours, one text per dialect.

    An "island" is a maximal run of consecutive hours whose event count
    exceeds 1.05x the event_type's average hourly count — the classic
    row_number-difference idiom: within a type, consecutive hour indexes
    minus their rank are constant exactly along a run.  Hour indexes are
    integer hours-since-epoch over the NTZ ts (never DATE_TRUNC, see the
    bucket note at the top of this module), so the text is
    session-timezone independent.  The threshold comparison is
    engine-exact: hourly counts are integers, AVG(bigint) is one IEEE
    division of exact integer sums in both engines, and 1.05 is cast to
    DOUBLE on both sides.
    """
    tail = """grouped AS (
    SELECT event_type, hour_idx, n_events,
           hour_idx - ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY hour_idx) AS grp
    FROM busy
)
SELECT event_type,
       CAST(MIN(hour_idx) AS BIGINT)  AS start_hour_idx,
       CAST(MAX(hour_idx) AS BIGINT)  AS end_hour_idx,
       CAST(COUNT(*) AS BIGINT)       AS n_hours,
       CAST(SUM(n_events) AS BIGINT)  AS n_busy_events,
       {start} AS island_start,
       {end} AS island_end_excl
FROM grouped
GROUP BY event_type, grp
"""
    if dialect == "spark":
        hour_idx = "TIMESTAMPDIFF(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        to_ts = "TIMESTAMPADD(HOUR, CAST({h} AS INT), TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        # Spark side only (r13 optimization pass): the per-type average
        # comes from a whole-partition window over `hourly` instead of a
        # separate GROUP BY + join back.  The join form re-derived the
        # (type, hour) aggregate from the raw events a second time (two
        # full scans + two aggregations in the executed plan); the window
        # form reads `hourly` once and shares the (event_type)-keyed
        # exchange the row_number window below needs anyway.  The value
        # is bit-identical: AVG over BIGINT counts is one IEEE division
        # of an exact LONG sum, order-free, in both the grouped and the
        # window form — and the DuckDB oracle text keeps the join shape,
        # so the driver hash-check proves the equivalence every sweep.
        return f"""
WITH hourly AS (
    SELECT event_type, {hour_idx} AS hour_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
), busy AS (
    SELECT event_type, hour_idx, n_events
    FROM (SELECT event_type, hour_idx, n_events,
                 AVG(n_events) OVER (PARTITION BY event_type) AS avg_n
          FROM hourly)
    WHERE n_events > avg_n * CAST(1.05 AS DOUBLE)
), {tail.format(start=to_ts.format(h='MIN(hour_idx)'), end=to_ts.format(h='MAX(hour_idx) + 1'))}"""
    # DuckDB oracle text: BYTE-IDENTICAL to the pre-r13 form (the ledger
    # tracks oracle texts; the optimization must not re-open green rows).
    hour_idx = "epoch_us(ts) // 3600000000"
    to_ts = "TIMESTAMP '1970-01-01 00:00:00' + CAST({h} AS INT) * INTERVAL 1 HOUR"
    return f"""
WITH hourly AS (
    SELECT event_type, {hour_idx} AS hour_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
), stats AS (
    SELECT event_type, AVG(n_events) AS avg_n FROM hourly GROUP BY 1
), busy AS (
    SELECT h.event_type, h.hour_idx, h.n_events
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
    WHERE h.n_events > s.avg_n * CAST(1.05 AS DOUBLE)
), {tail.format(start=to_ts.format(h='MIN(hour_idx)'), end=to_ts.format(h='MAX(hour_idx) + 1'))}"""


q_events_activity_islands = Query(
    name="events_activity_islands",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(_islands_sql("spark")),
    )[1],
    oracle=_islands_sql("duckdb"),
    doc="Gaps-and-islands: maximal runs of consecutive busy hours per "
    "event_type (count > 1.05x the type's hourly average) via the "
    "row_number-difference idiom — one hourly aggregate, a broadcast-"
    "sized per-type stats join, and a window over the tiny busy-hours "
    "frame; the raw events are scanned once.",
)


# Per-user session intervals, half-open ([first event, last event + 1 us))
# so single-event sessions still have positive measure under the overlap
# predicate.  Same sessionization CTE as events_sessionize.
_SESSIONS_INTERVAL_SQL_SPARK = """
WITH gaps AS (
    SELECT user_id, ts, event_id,
           TIMESTAMPDIFF(MICROSECOND, LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_micros
    FROM events
), marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN gap_micros IS NULL OR gap_micros > 1800000000 THEN 1 ELSE 0 END AS is_session_start
    FROM gaps
), sessions AS (
    SELECT user_id, ts, event_id,
           SUM(is_session_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 1 MICROSECOND AS session_end_excl
FROM sessions
GROUP BY user_id, session_seq
"""


def _build_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import interval_overlap_join

    load_views(spark, sf_dir)
    sessions = spark.sql(_SESSIONS_INTERVAL_SQL_SPARK)
    islands = spark.sql(_islands_sql("spark")).select(
        "event_type", "start_hour_idx", "island_start", "island_end_excl"
    )
    joined = interval_overlap_join(
        sessions,
        islands,
        "session_start",
        "session_end_excl",
        "island_start",
        "island_end_excl",
        # 1-hour chunks: sessions are sub-hour (30-min gap close), islands
        # are a few hours — both sides explode into O(1) chunk rows and
        # the join key count grows with the data's time span.
        chunk_micros=3_600_000_000,
    )
    return joined.select(
        "user_id",
        "session_seq",
        "event_type",
        F.col("start_hour_idx").alias("island_start_hour_idx"),
        F.expr(
            "CAST(TIMESTAMPDIFF(MICROSECOND,"
            " greatest(session_start, island_start),"
            " least(session_end_excl, island_end_excl)) AS BIGINT)"
        ).alias("overlap_micros"),
    )


_INTERVAL_JOIN_ORACLE = f"""
WITH gaps AS (
    SELECT user_id, ts, event_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_micros
    FROM events
), marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN gap_micros IS NULL OR gap_micros > 1800000000 THEN 1 ELSE 0 END AS is_session_start
    FROM gaps
), sessions AS (
    SELECT user_id, ts, event_id,
           SUM(is_session_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM marked
), sess AS (
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 1 MICROSECOND AS session_end_excl
    FROM sessions
    GROUP BY user_id, session_seq
), islands AS ({_islands_sql('duckdb')})
SELECT s.user_id, s.session_seq, i.event_type,
       i.start_hour_idx AS island_start_hour_idx,
       CAST(epoch_us(LEAST(s.session_end_excl, i.island_end_excl)) -
            epoch_us(GREATEST(s.session_start, i.island_start)) AS BIGINT) AS overlap_micros
FROM sess s JOIN islands i
  ON s.session_start < i.island_end_excl AND i.island_start < s.session_end_excl
"""


q_events_interval_join = Query(
    name="events_interval_join",
    build=_build_interval_join,
    oracle=_INTERVAL_JOIN_ORACLE,
    doc="Interval overlap join (user sessions x busy-hour islands) via "
    "operators.interval_overlap_join: intervals explode row-locally to "
    "1-hour chunk ids, the join runs as a plain equi-join on chunk, the "
    "exact overlap predicate refines, and each pair is emitted exactly "
    "once by the chunk containing the overlap's start — never the "
    "BroadcastNestedLoopJoin Spark plans for a raw inequality join "
    "(the DuckDB oracle uses its native IEJoin for the same predicate).",
)


def _build_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import stream_interval_enrich

    load_views(spark, sf_dir)
    islands = spark.sql(_islands_sql("spark")).select(
        F.col("event_type").alias("island_type"),
        "start_hour_idx",
        "island_start",
        "island_end_excl",
    )
    enriched = stream_interval_enrich(
        spark.table("events").select("event_id", "event_type", "ts"),
        islands,
        ts_col="ts",
        start_col="island_start",
        end_col="island_end_excl",
        how="inner",
    )
    return enriched.groupBy("event_type", "island_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_in_islands"),
        F.countDistinct("start_hour_idx").cast("bigint").alias("n_islands_hit"),
    )


_POINT_IN_INTERVAL_ORACLE = f"""
WITH islands AS ({_islands_sql('duckdb')})
SELECT e.event_type, i.event_type AS island_type,
       CAST(COUNT(*) AS BIGINT) AS n_events_in_islands,
       CAST(COUNT(DISTINCT i.start_hour_idx) AS BIGINT) AS n_islands_hit
FROM events e JOIN islands i
  ON i.island_start <= e.ts AND e.ts < i.island_end_excl
GROUP BY 1, 2
"""


q_events_point_in_interval = Query(
    name="events_point_in_interval",
    build=_build_point_in_interval,
    oracle=_POINT_IN_INTERVAL_ORACLE,
    doc="Point-in-interval tagging (events x busy-hour islands) through "
    "streaming.stream_interval_enrich run in batch mode — the event's "
    "chunk id is one row-local expression, islands explode into covered "
    "chunks, and the join is a chunk equi-join with a range refine "
    "(the state-free micro-batch shape, here driver-verified against "
    "DuckDB's native range join); aggregated to a (event_type x "
    "island_type) contingency so the driver frame stays small.",
)


q_events_value_histogram = _shared(
    "events_value_histogram",
    f"""
SELECT event_type,
       CAST(LEAST(GREATEST(CAST(FLOOR(value / 1.0e1) AS BIGINT), 0), 49) AS BIGINT) AS bucket_idx,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       {dsum('value')} AS bucket_value_sum
FROM events
GROUP BY 1, 2
""",
    "Fixed-bin value histogram per event_type (50 buckets of width 10, "
    "edge-clamped) — the exact-oracle face of the mergeable quantile "
    "sketch rollup.SketchRollup stores per (type, hour): identical "
    "bucketing expression, so the driver-verified counts here are the "
    "same numbers the incremental state accumulates; quantile estimates "
    "derive from them at read time (hist_quantile). Division by a "
    "DOUBLE literal (1.0e1, never a bare decimal literal) keeps the "
    "bucket index IEEE-identical across engines.",
)


QUERIES = [
    q_events_tumbling_window,
    q_events_sessionize,
    q_events_funnel,
    q_events_dedup_exact,
    q_events_asof_join,
    q_events_approx_sketches,
    q_events_time_rollup,
    q_events_retention_cohorts,
    q_events_anomaly_zscore,
    q_events_hll_rollup,
    q_events_approx_topk,
    q_events_gapfill,
    q_events_activity_islands,
    q_events_interval_join,
    q_events_value_histogram,
    q_events_point_in_interval,
]
