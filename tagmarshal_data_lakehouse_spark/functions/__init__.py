"""Scalar function surface (SURVEY.md §2.8) + Trino→Spark dialect shims.

The reference uses two SQL dialects (Spark in the ETL, Trino in dbt/gold and
the dashboard).  This module provides the Spark-native equivalents of every
Trino construct the reference relies on, so the gold models and query
library translate mechanically (SURVEY.md §7.4 traps 1-2):

- ``DATE_DIFF('second'|'minute'|'day', a, b)``  -> date_diff_* helpers
- Trino ``day_of_week`` (1=Mon)  vs Spark ``dayofweek`` (1=Sun) -> iso_dayofweek
- ``FORMAT_DATETIME(ts, 'MMMM'|'EEEE')``        -> month_name / day_name
- ``APPROX_PERCENTILE(x, p)``                   -> F.percentile_approx
  (plus exact ``median_exact`` used where oracle hash-parity matters)
- ``ARRAY_AGG(DISTINCT x ORDER BY x)`` + ARRAY_JOIN -> sorted_set_join
- 100.0*x/NULLIF(y,0) division guards           -> pct / safe_div

All of these are thin compositions of ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen-able, no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_diff_seconds(start: Column, end: Column) -> Column:
    """Trino DATE_DIFF('second', a, b) (reference gold/models/gold/
    fact_rounds.sql:49). Spark has no second-granularity datediff; use
    epoch subtraction (stays in codegen)."""
    return end.cast("long") - start.cast("long")


def date_diff_minutes(start: Column, end: Column) -> Column:
    """Trino DATE_DIFF('minute', a, b) — integer minutes (truncating),
    matching Trino's semantics of whole elapsed units."""
    return ((end.cast("long") - start.cast("long")) / 60).cast("long")


def iso_dayofweek(ts: Column) -> Column:
    """ISO day-of-week, 1=Monday..7=Sunday.

    Spark's dayofweek() is 1=Sunday (used in reference silver,
    etl.py:467-473) while Trino's day_of_week() is 1=Monday (used in
    reference gold, fact_rounds.sql:114). The engine standardizes gold
    outputs on ISO and converts explicitly (SURVEY.md §7.4 trap 1).
    """
    return ((F.dayofweek(ts) + F.lit(5)) % F.lit(7)) + F.lit(1)


def is_weekend(ts: Column) -> Column:
    """Trino day_of_week IN (6,7) == Sat/Sun (global_time_patterns.sql:53)."""
    return iso_dayofweek(ts) >= F.lit(6)


def month_name(ts: Column) -> Column:
    """Trino FORMAT_DATETIME(ts,'MMMM') (course_rounds_by_month.sql)."""
    return F.date_format(ts, "MMMM")


def day_name(ts: Column) -> Column:
    """Trino FORMAT_DATETIME(ts,'EEEE') (course_rounds_by_weekday.sql)."""
    return F.date_format(ts, "EEEE")


def median_exact(col: Column | str) -> Column:
    """Exact median (percentile 0.5 with linear interpolation). The
    reference uses APPROX_PERCENTILE(x, 0.5) (global_overview.sql:59);
    we expose the exact form so results hash-match a SQL oracle, and
    `median_approx` for the scale path."""
    return F.percentile(col, F.lit(0.5))


def median_approx(col: Column | str, accuracy: int = 10000) -> Column:
    """The 100 TB-scale path: t-digest style approximate median, constant
    memory per group (maps to Trino APPROX_PERCENTILE)."""
    return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))


def sorted_set_join(col: Column | str, sep: str = "+") -> Column:
    """Trino ARRAY_JOIN(ARRAY_AGG(DISTINCT x ORDER BY x), '+') — the
    "nines played" label (dashboard/utils/queries.py:596,607)."""
    return F.array_join(F.sort_array(F.collect_set(col)), sep)


def safe_div(num: Column, den: Column) -> Column:
    """x / NULLIF(y, 0) — the reference's ubiquitous divide-by-zero guard
    (fact_rounds.sql:93-99)."""
    return num / F.nullif(den, F.lit(0))


def pct(num: Column, den: Column, scale: int = 2) -> Column:
    """ROUND(100.0 * x / NULLIF(y,0), scale) — percentage-of-total idiom
    (critical_column_gaps.sql, data_quality_overview.sql)."""
    return F.round(F.lit(100.0) * num / F.nullif(den, F.lit(0)), scale)


def count_if(cond: Column) -> Column:
    """Conditional count: SUM(CASE WHEN cond THEN 1 ELSE 0 END) /
    count_if(cond) — the workhorse aggregate (SURVEY §2.4 A1)."""
    return F.count_if(cond)


def point_wkt(lon: Column, lat: Column) -> Column:
    """POINT(lon lat) WKT string (reference etl.py:554-567); NULL if either
    coordinate is NULL."""
    return F.when(
        lon.isNotNull() & lat.isNotNull(),
        F.concat(F.lit("POINT("), lon.cast("string"), F.lit(" "), lat.cast("string"), F.lit(")")),
    )
