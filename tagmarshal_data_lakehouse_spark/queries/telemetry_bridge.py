"""Driver rows for the telemetry library (reference-parity surface).

The telemetry query library (queries/telemetry.py — every dashboard /
exploration / example SQL the reference ships) runs over golf-telemetry
tables that do not exist in the driver's TPC-H-shaped sf_dir, so until
round 4 its only hard check was the pytest two-engine suite
(tests/test_telemetry_oracle.py).  This module gives a few flagship
library queries DRIVER rows too, by bridging the driver's `events`
table into a deterministic `fact_telemetry_event` view and running the
REAL library texts (same strings `run_telemetry_query` serves) on top.

The bridge mapping is integer-arithmetic only, spelled once per engine
(Spark temp view / DuckDB CTE), and engineered so every derived value is
cross-engine exact:

- all ids/holes/sections come from `%` on BIGINTs (identical remainder
  semantics both engines);
- `pace` is an INTEGER-VALUED double (FLOOR(value*100) % 50 + 1), so
  DECIMAL-exact AVG rewrites (telemetry._exact_avg_std) produce
  bit-identical doubles — no half-boundary ROUND risk;
- `FLOOR` (not CAST) converts the double: Spark's double->bigint CAST
  truncates while DuckDB's rounds, so CAST would diverge; FLOOR agrees.
- pace / battery / hole_number / longitude / latitude / fix_timestamp
  carry deterministic NULL stripes (event_id mod a distinct prime
  each), so the library's NULL-preserving semantics — the reference
  pipeline's defining rule — are exercised for real: FILTER clauses,
  IS NOT NULL predicates, and AVG's null-skipping all see non-trivial
  inputs, and both engines derive the identical stripe.  The
  `is_timestamp_missing` flag is CONSISTENT with its column: flagged
  rows really have fix_timestamp NULL (round_id / event_date still
  derive from the raw event time, the reference's keep-and-flag rule —
  no data loss).

Queries chosen are fact-only (no gold DAG to inline) and free of
approximate aggregates (the driver hashes every output column, and
percentile sketches are engine-specific).  The rest of the 94-query
library surface keeps its same-text pytest oracle — inlining the gold
DAG into single DuckDB statements is not worth the duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import Query, load_views

_COURSE = "course_1"
_HOLE = 5

# Spark spelling of the bridge mapping (dialect: STRING, TIMESTAMPDIFF).
# Rounds are (user, day, hour) grain so round durations land inside the
# library's 0-600-minute validity window; duration is derived through
# EXACT microsecond arithmetic (the testdata is µs-precision, so the µs
# difference is the same integer on both engines — minute- or
# second-grain datediffs would diverge: Spark truncates, DuckDB counts
# boundary crossings).
_SPARK_BRIDGE = """
    WITH base AS (
        SELECT
            'r' || CAST(user_id AS STRING) || '_'
                || CAST(CAST(ts AS DATE) AS STRING) || '_'
                || CAST(HOUR(ts) AS STRING)                             AS round_id,
            'course_' || CAST(user_id % 3 AS STRING)                    AS course_id,
            IF(event_id % 23 = 0, NULL, ts)                             AS fix_timestamp,
            CAST(ts AS DATE)                                            AS event_date,
            CAST(CAST(ts AS DATE) AS STRING)                            AS ingest_date,
            FALSE                                                       AS is_location_padding,
            FALSE                                                       AS is_nine_hole,
            'd' || CAST(user_id % 7 AS STRING)                          AS device,
            CAST(user_id % 18 + 1 AS INT)                               AS start_hole,
            CASE WHEN event_id % 37 = 0 THEN CAST(NULL AS INT)
                 ELSE CAST(event_id % 18 + 1 AS INT) END                AS hole_number,
            CAST(event_id % 54 + 1 AS INT)                              AS section_number,
            CAST(CASE WHEN event_id % 18 < 9 THEN 1 ELSE 2 END AS INT)  AS nine_number,
            CASE WHEN event_id % 29 = 0 THEN CAST(NULL AS DOUBLE)
                 ELSE CAST(CAST(FLOOR(value * 100) AS BIGINT) % 50 + 1 AS DOUBLE)
            END                                                         AS pace,
            CASE WHEN event_id % 31 = 0 THEN CAST(NULL AS DOUBLE)
                 ELSE CAST(CAST(FLOOR(value * 10) AS BIGINT) % 101 AS DOUBLE)
            END                                                         AS battery_percentage,
            CAST(event_id AS INT)                                       AS location_index,
            event_id % 23 = 0                                           AS is_timestamp_missing,
            CASE WHEN event_id % 11 = 0 THEN CAST(NULL AS DOUBLE)
                 ELSE CAST(CAST(FLOOR(value * 1000) AS BIGINT) % 3600 AS DOUBLE)
            END                                                         AS longitude,
            CASE WHEN event_id % 13 = 0 THEN CAST(NULL AS DOUBLE)
                 ELSE CAST(CAST(FLOOR(value * 1000) AS BIGINT) % 1800 AS DOUBLE)
            END                                                         AS latitude
        FROM events
    )
    SELECT base.*,
           CAST(FLOOR(TIMESTAMPDIFF(MICROSECOND,
                    MIN(fix_timestamp) OVER (PARTITION BY round_id),
                    MAX(fix_timestamp) OVER (PARTITION BY round_id))
                / 60000000) AS BIGINT)                                  AS round_duration_minutes
    FROM base
"""

# DuckDB spelling (VARCHAR instead of STRING; date_diff instead of
# TIMESTAMPDIFF; HOUR/FLOOR/CAST/%/|| agree).
_DUCK_BRIDGE = _SPARK_BRIDGE.replace("AS STRING)", "AS VARCHAR)").replace(
    "TIMESTAMPDIFF(MICROSECOND,", "date_diff('microsecond',"
)


def _bridged(spark: SparkSession, sf_dir: str, name: str, **params) -> DataFrame:
    """Register the bridge view, then run the real library text (a
    parameterized render or a fixed TELEMETRY_QUERIES constant)."""
    from . import telemetry

    load_views(spark, sf_dir)
    spark.sql(_SPARK_BRIDGE).createOrReplaceTempView("fact_telemetry_event")
    if name in telemetry.PARAMETERIZED:
        return spark.sql(telemetry.PARAMETERIZED[name](**params))
    return spark.sql(telemetry.TELEMETRY_QUERIES[name])


def _cast_cols(df: DataFrame, dtype: str, *cols: str) -> DataFrame:
    """Registry-shape shim: re-type output columns so both engines ship
    the same pandas transport type. The library text itself is never
    changed — only the registry entry re-types its result."""
    from pyspark.sql import functions as F

    for c in cols:
        df = df.withColumn(c, F.col(c).cast(dtype))
    return df


def _dates_as_ntz(df: DataFrame, *cols: str) -> DataFrame:
    """DATE columns -> TIMESTAMP_NTZ (same convention as the events
    queries): Spark's toPandas ships dates as python objects while
    DuckDB's ships datetime64 — the harness would compare them unequal."""
    return _cast_cols(df, "timestamp_ntz", *cols)


q_telemetry_start_hole_distribution = Query(
    name="telemetry_start_hole_distribution",
    build=lambda spark, sf_dir: _bridged(
        spark, sf_dir, "get_start_hole_distribution", course_id=_COURSE
    ),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            start_hole,
            COUNT(DISTINCT round_id) AS rounds
        FROM fact_telemetry_event
        WHERE course_id = '{_COURSE}'
          AND start_hole IS NOT NULL
        GROUP BY start_hole
        ORDER BY rounds DESC, start_hole
    """,
    doc="Reference parity, shotgun-start distribution "
    "(examples/indiancreek_shotgun_start_distribution.sql; the same text "
    "run_telemetry_query('get_start_hole_distribution') serves) over the "
    "events->telemetry bridge — exact COUNT DISTINCT per start hole.",
)

q_telemetry_avg_pace_by_hole = Query(
    name="telemetry_avg_pace_by_hole",
    build=lambda spark, sf_dir: _bridged(
        spark, sf_dir, "get_avg_pace_by_hole", course_id=_COURSE
    ),
    # Mirrors the _exact_avg_std-rewritten text the Spark side actually
    # runs: decimal-exact sum, double division — bit-identical on both
    # engines for the integer-valued bridge pace.
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            hole_number,
            (CAST(SUM(CAST(pace AS DECIMAL(28,10))) AS DOUBLE) / COUNT(pace)) AS avg_pace,
            COUNT(*) AS fixes
        FROM fact_telemetry_event
        WHERE course_id = '{_COURSE}'
          AND hole_number IS NOT NULL
        GROUP BY hole_number
        ORDER BY hole_number
    """,
    doc="Reference parity, average pace per hole "
    "(examples/common_queries.sql:29-37) over the events->telemetry "
    "bridge; AVG runs in the library's decimal-exact form.",
)

q_telemetry_pace_comparison_hole = Query(
    name="telemetry_pace_comparison_hole",
    build=lambda spark, sf_dir: _bridged(
        spark,
        sf_dir,
        "get_pace_comparison_for_hole",
        course_id=_COURSE,
        hole_number=_HOLE,
    ),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            round_id, nine_number,
            CASE
                WHEN nine_number = 1 THEN 'first_nine'
                WHEN nine_number = 2 THEN 'second_nine'
                ELSE 'nine_' || CAST(nine_number AS VARCHAR)
            END AS pass_number,
            pace, fix_timestamp
        FROM fact_telemetry_event
        WHERE is_location_padding = FALSE
          AND course_id = '{_COURSE}'
          AND is_nine_hole = FALSE
          AND pace IS NOT NULL AND pace > 0 AND pace < 60
          AND hole_number = {_HOLE}
          AND nine_number IS NOT NULL
        ORDER BY round_id, fix_timestamp
    """,
    doc="Reference parity, per-round loop-fatigue detail for one hole "
    "(dashboard/utils/queries.py:1503-1529) over the events->telemetry "
    "bridge — row-level projection, no aggregation.",
)

q_telemetry_round_duration = Query(
    name="telemetry_round_duration",
    build=lambda spark, sf_dir: _dates_as_ntz(
        _bridged(spark, sf_dir, "get_round_duration_for_course", course_id=_COURSE),
        "round_date",
    ),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE}),
        round_stats AS (
            SELECT
                course_id,
                round_id,
                MAX(round_duration_minutes) AS duration_minutes,
                MAX(CAST(is_nine_hole AS INTEGER)) = 1 AS is_nine_hole,
                COUNT(DISTINCT hole_number) AS holes_visited,
                MIN(event_date) AS round_date
            FROM fact_telemetry_event
            WHERE is_location_padding = FALSE
              AND course_id = '{_COURSE}'
            GROUP BY course_id, round_id
        )
        SELECT
            course_id,
            round_id,
            CAST(round_date AS TIMESTAMP) AS round_date,
            duration_minutes,
            is_nine_hole,
            holes_visited,
            CASE WHEN is_nine_hole THEN '9-hole' ELSE '18-hole' END AS round_type
        FROM round_stats
        WHERE duration_minutes IS NOT NULL
          AND duration_minutes > 0
          AND duration_minutes < 600
        ORDER BY round_date DESC
    """,
    doc="Reference parity, per-round duration details "
    "(dashboard/utils/queries.py:912-947; the text "
    "run_telemetry_query('get_round_duration_for_course') serves) over "
    "the events->telemetry bridge at (user, day, hour) round grain — "
    "integer-exact µs-derived durations, no doubles anywhere.",
)

q_telemetry_global_overview = Query(
    name="telemetry_global_overview",
    build=lambda spark, sf_dir: _dates_as_ntz(
        _bridged(spark, sf_dir, "global_overview"), "earliest_date", "latest_date"
    ),
    # The library text's ROUND(AVG(x),1) runs in its _exact_avg_std
    # decimal-exact form on Spark; the oracle mirrors that form and
    # inlines the Spark-semantics ROUND (round the shortest-decimal
    # representation: VARCHAR -> DECIMAL(38,20) -> round) because the
    # driver's DuckDB session has no macros.
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            COUNT(DISTINCT course_id) AS total_courses,
            COUNT(DISTINCT round_id) AS total_rounds,
            COUNT(*) AS total_events,
            CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END)
                 AS BIGINT) AS real_events,
            COUNT(DISTINCT device) AS unique_devices,
            CAST(MIN(event_date) AS TIMESTAMP) AS earliest_date,
            CAST(MAX(event_date) AS TIMESTAMP) AS latest_date,
            COUNT(DISTINCT event_date) AS total_playing_days,
            CAST(round(CAST(CAST(
                (CAST(SUM(CAST(pace AS DECIMAL(28,10))) AS DOUBLE) / COUNT(pace))
                AS VARCHAR) AS DECIMAL(38,20)), 1) AS DOUBLE) AS global_avg_pace,
            CAST(round(CAST(CAST(
                (CAST(SUM(CAST(battery_percentage AS DECIMAL(28,10))) AS DOUBLE)
                 / COUNT(battery_percentage))
                AS VARCHAR) AS DECIMAL(38,20)), 1) AS DOUBLE) AS global_avg_battery
        FROM fact_telemetry_event
        WHERE is_location_padding = FALSE
    """,
    doc="Reference parity, the dashboard's global overview strip "
    "(dashboard/utils/queries.py global stats: courses/rounds/events/"
    "devices/dates + decimal-exact global averages) over the "
    "events->telemetry bridge.",
)

q_telemetry_events_by_hour = Query(
    name="telemetry_events_by_hour",
    build=lambda spark, sf_dir: _bridged(spark, sf_dir, "ex_events_by_hour"),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            HOUR(fix_timestamp) AS hour_of_day,
            COUNT(*) AS fixes,
            COUNT(DISTINCT round_id) AS rounds
        FROM fact_telemetry_event
        WHERE fix_timestamp IS NOT NULL
        GROUP BY HOUR(fix_timestamp)
        ORDER BY hour_of_day
    """,
    doc="Reference parity, hourly fix/round distribution "
    "(examples/common_queries.sql; the text "
    "run_telemetry_query('ex_events_by_hour') serves) over the "
    "events->telemetry bridge — exact counts per hour.",
)

q_telemetry_null_correlation = Query(
    name="telemetry_null_correlation",
    build=lambda spark, sf_dir: _bridged(spark, sf_dir, "expl_np_null_correlation"),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            is_timestamp_missing,
            COUNT(*) AS row_count,
            COUNT(*) FILTER (WHERE longitude IS NULL) AS null_longitude_count,
            COUNT(*) FILTER (WHERE latitude IS NULL) AS null_latitude_count,
            COUNT(*) FILTER (WHERE pace IS NULL) AS null_pace_count,
            COUNT(*) FILTER (WHERE battery_percentage IS NULL) AS null_battery_count,
            COUNT(*) FILTER (WHERE hole_number IS NULL) AS null_hole_count
        FROM fact_telemetry_event
        GROUP BY is_timestamp_missing
        ORDER BY is_timestamp_missing
    """,
    doc="Reference parity, NULL-correlation audit "
    "(exploration/null_patterns.sql; the text "
    "run_telemetry_query('expl_np_null_correlation') serves) over the "
    "bridge's deterministic NULL stripes — the NULL-preserving "
    "semantics check (no 'helpful' filtering anywhere on the path).",
)


def _missing_pct_as_double(df: DataFrame) -> DataFrame:
    """The library text's ROUND(100.0 * x / y, 2) is DECIMAL-typed on
    Spark (decimal literal arithmetic) while DuckDB's lands as its own
    decimal; both are EXACT 2-dp values of the same rational, so a
    double cast on both sides is the identical IEEE value — only the
    transport type changes."""
    return _cast_cols(df, "double", "missing_percentage")


q_telemetry_missing_ts_overview = Query(
    name="telemetry_missing_ts_overview",
    build=lambda spark, sf_dir: _missing_pct_as_double(
        _bridged(spark, sf_dir, "expl_np_missing_ts_overview")
    ),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            COUNT(*) AS total_rows,
            COUNT(*) FILTER (WHERE is_timestamp_missing = true) AS missing_timestamp_count,
            COUNT(*) FILTER (WHERE is_timestamp_missing = false) AS valid_timestamp_count,
            CAST(ROUND(100.0 * COUNT(*) FILTER (WHERE is_timestamp_missing = true)
                       / COUNT(*), 2) AS DOUBLE) AS missing_percentage
        FROM fact_telemetry_event
    """,
    doc="Reference parity, missing-timestamp overview "
    "(exploration/null_patterns.sql; the text "
    "run_telemetry_query('expl_np_missing_ts_overview') serves) — "
    "FILTER-clause counts + an exact-decimal percentage, shipped as "
    "double on both engines.",
)

q_telemetry_missing_ts_by_ingest = Query(
    name="telemetry_missing_ts_by_ingest",
    build=lambda spark, sf_dir: _missing_pct_as_double(
        _bridged(spark, sf_dir, "expl_np_missing_ts_by_ingest")
    ),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            ingest_date,
            COUNT(*) AS total_rows,
            COUNT(*) FILTER (WHERE is_timestamp_missing = true) AS missing_count,
            CAST(ROUND(100.0 * COUNT(*) FILTER (WHERE is_timestamp_missing = true)
                       / COUNT(*), 2) AS DOUBLE) AS missing_percentage
        FROM fact_telemetry_event
        GROUP BY ingest_date
        ORDER BY ingest_date DESC
    """,
    doc="Reference parity, missing-timestamp counts per ingest partition "
    "(exploration/null_patterns.sql; the text "
    "run_telemetry_query('expl_np_missing_ts_by_ingest') serves).",
)

q_telemetry_missing_ts_by_location = Query(
    name="telemetry_missing_ts_by_location",
    build=lambda spark, sf_dir: _missing_pct_as_double(
        _bridged(spark, sf_dir, "expl_np_missing_ts_by_location_index")
    ),
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            location_index,
            COUNT(*) AS total_rows,
            COUNT(*) FILTER (WHERE is_timestamp_missing = true) AS missing_count,
            CAST(ROUND(100.0 * COUNT(*) FILTER (WHERE is_timestamp_missing = true)
                       / COUNT(*), 2) AS DOUBLE) AS missing_percentage
        FROM fact_telemetry_event
        GROUP BY location_index
        HAVING COUNT(*) FILTER (WHERE is_timestamp_missing = true) > 0
        ORDER BY location_index
    """,
    doc="Reference parity, missing-timestamp hot spots by location index "
    "(exploration/null_patterns.sql; HAVING over a FILTER aggregate).",
)

q_telemetry_missing_ts_trend = Query(
    name="telemetry_missing_ts_trend",
    build=lambda spark, sf_dir: _dates_as_ntz(
        _missing_pct_as_double(_bridged(spark, sf_dir, "expl_np_missing_ts_trend")),
        "ingest_month",
    ),
    # The library text's TRUNC(date, 'MM') is Spark dialect; the driver's
    # macro-less DuckDB spells it date_trunc('month', ...) — same month
    # boundary, tz-free (the registry's TRUNC-not-DATE_TRUNC rationale).
    oracle=f"""
        WITH fact_telemetry_event AS ({_DUCK_BRIDGE})
        SELECT
            CAST(date_trunc('month', CAST(ingest_date AS DATE)) AS TIMESTAMP)
                AS ingest_month,
            COUNT(*) AS total_rows,
            COUNT(*) FILTER (WHERE is_timestamp_missing = true) AS missing_count,
            CAST(ROUND(100.0 * COUNT(*) FILTER (WHERE is_timestamp_missing = true)
                       / COUNT(*), 2) AS DOUBLE) AS missing_percentage
        FROM fact_telemetry_event
        GROUP BY date_trunc('month', CAST(ingest_date AS DATE))
        ORDER BY ingest_month DESC
    """,
    doc="Reference parity, monthly missing-timestamp trend "
    "(exploration/null_patterns.sql; month-truncated ingest partitions).",
)

QUERIES = [
    q_telemetry_start_hole_distribution,
    q_telemetry_avg_pace_by_hole,
    q_telemetry_pace_comparison_hole,
    q_telemetry_round_duration,
    q_telemetry_global_overview,
    q_telemetry_events_by_hour,
    q_telemetry_null_correlation,
    q_telemetry_missing_ts_overview,
    q_telemetry_missing_ts_by_ingest,
    q_telemetry_missing_ts_by_location,
    q_telemetry_missing_ts_trend,
]
