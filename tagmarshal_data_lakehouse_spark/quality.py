"""Quality harness: the reference's dbt data tests as Spark assertions.

Ports (reference file:line):
- generic tests `not_null`, `unique`,
  `dbt_utils.unique_combination_of_columns`,
  `dbt_utils.accepted_range`, `dbt_utils.expression_is_true`
  from pipeline/gold/models/sources.yml:1-58,
  models/gold/schema.yml and models/silver_normalized/schema.yml;
- custom generic tests `non_negative`
  (pipeline/gold/macros/tests/non_negative.sql:1-10) and
  `between_0_and_100` (macros/tests/between_0_and_100.sql:1-10);
- the singular duplicate-grain test
  (pipeline/gold/tests/duplicate_round_fix_timestamp.sql:1-18) as a
  unique-combination check on (round_id, location_index).

Scale design: all checks for one table compile into ONE aggregation
pass — per-row checks become SUM(CASE WHEN violation), uniqueness checks
become COUNT(*) - COUNT(DISTINCT named_struct(cols)) — so a full quality
run costs one scan per table regardless of how many checks it carries.
dbt runs one query per test; at 100 TB that difference is the whole
game.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class Check:
    table: str
    name: str
    # SQL boolean expression, TRUE when a row VIOLATES the check
    violation: str | None = None
    # uniqueness check over these columns (instead of a row predicate)
    unique_cols: tuple[str, ...] | None = None


@dataclass(frozen=True)
class CheckResult:
    table: str
    name: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def not_null(table: str, col: str) -> Check:
    return Check(table, f"not_null({col})", violation=f"{col} IS NULL")


def unique(table: str, col: str) -> Check:
    return Check(table, f"unique({col})", unique_cols=(col,))


def unique_combination(table: str, *cols: str) -> Check:
    return Check(table, f"unique_combination({', '.join(cols)})", unique_cols=tuple(cols))


def accepted_range(table: str, col: str, lo: float, hi: float) -> Check:
    return Check(
        table,
        f"accepted_range({col}, {lo}, {hi})",
        violation=f"{col} IS NOT NULL AND ({col} < {lo} OR {col} > {hi})",
    )


def expression_is_true(table: str, expr: str, name: str | None = None) -> Check:
    return Check(table, name or f"expression_is_true({expr})", violation=f"NOT ({expr})")


def non_negative(table: str, col: str) -> Check:
    return Check(table, f"non_negative({col})", violation=f"{col} IS NOT NULL AND {col} < 0")


def between_0_and_100(table: str, col: str) -> Check:
    return Check(
        table,
        f"between_0_and_100({col})",
        violation=f"{col} IS NOT NULL AND ({col} < 0 OR {col} > 100)",
    )


# ---------------------------------------------------------------------------
# The full declarative suite (sources.yml + both schema.yml files)
# ---------------------------------------------------------------------------

CHECKS: list[Check] = [
    # silver source contract (sources.yml:8-38 + singular duplicate test)
    not_null("fact_telemetry_event", "round_id"),
    not_null("fact_telemetry_event", "course_id"),
    not_null("fact_telemetry_event", "is_timestamp_missing"),
    not_null("fact_telemetry_event", "is_location_padding"),
    expression_is_true(
        "fact_telemetry_event",
        "is_timestamp_missing = (fix_timestamp IS NULL)",
        name="ts_missing_flag_invariant",
    ),
    accepted_range("fact_telemetry_event", "latitude", -90, 90),
    accepted_range("fact_telemetry_event", "longitude", -180, 180),
    unique_combination("fact_telemetry_event", "round_id", "location_index"),
    # dims (sources.yml:40-58)
    not_null("dim_facility_topology", "facility_id"),
    not_null("dim_facility_topology", "unit_id"),
    not_null("dim_course_profile", "course_id"),
    # gold/schema.yml
    unique_combination("fact_rounds", "course_id", "round_id"),
    not_null("fact_rounds", "course_id"),
    not_null("fact_rounds", "round_id"),
    non_negative("fact_rounds", "duration_sec"),
    # rates are 0..1 fractions; the reference's between_0_and_100 bound
    # still holds and is what its schema.yml declares
    between_0_and_100("fact_rounds", "projected_rate"),
    between_0_and_100("fact_rounds", "problem_rate"),
    between_0_and_100("fact_rounds", "cached_rate"),
    between_0_and_100("fact_rounds", "ts_missing_rate"),
    unique_combination("pace_summary_by_round", "course_id", "round_id"),
    not_null("pace_summary_by_round", "round_id"),
    not_null("pace_summary_by_round", "course_id"),
    non_negative("pace_summary_by_round", "fix_count"),
    unique_combination("signal_quality_rounds", "course_id", "round_id"),
    not_null("signal_quality_rounds", "round_id"),
    not_null("signal_quality_rounds", "course_id"),
    between_0_and_100("signal_quality_rounds", "projected_rate"),
    between_0_and_100("signal_quality_rounds", "problem_rate"),
    not_null("device_health_errors", "round_id"),
    not_null("device_health_errors", "course_id"),
    not_null("dim_course", "course_id"),
    unique("dim_course", "course_id"),
    not_null("data_quality_overview", "course_id"),
    unique("data_quality_overview", "course_id"),
    between_0_and_100("data_quality_overview", "data_quality_score"),
    not_null("course_configuration_analysis", "course_id"),
    unique("course_configuration_analysis", "course_id"),
    between_0_and_100("course_configuration_analysis", "pct_complete"),
    between_0_and_100("course_configuration_analysis", "pct_incomplete"),
    between_0_and_100("course_configuration_analysis", "pct_nine_hole"),
    between_0_and_100("course_configuration_analysis", "pct_full_rounds"),
    between_0_and_100("course_configuration_analysis", "pct_shotgun_starts"),
    not_null("critical_column_gaps", "course_id"),
    unique("critical_column_gaps", "course_id"),
    unique_combination(
        "fact_round_hole_performance", "course_id", "round_id", "hole_number", "nine_number"
    ),
    not_null("fact_round_hole_performance", "course_id"),
    not_null("fact_round_hole_performance", "round_id"),
    not_null("fact_round_hole_performance", "hole_number"),
    non_negative("fact_round_hole_performance", "duration_sec"),
    not_null("course_rounds_by_month", "course_id"),
    not_null("course_rounds_by_month", "month_start"),
    non_negative("course_rounds_by_month", "rounds"),
    between_0_and_100("course_rounds_by_month", "pct_total"),
    unique_combination("course_rounds_by_month", "course_id", "month_start"),
    not_null("course_rounds_by_weekday", "course_id"),
    not_null("course_rounds_by_weekday", "weekday_number"),
    non_negative("course_rounds_by_weekday", "rounds"),
    unique_combination("course_rounds_by_weekday", "course_id", "weekday_number"),
    unique_combination("course_start_hole_distribution", "course_id", "start_hole"),
    not_null("course_start_hole_distribution", "course_id"),
    not_null("course_start_hole_distribution", "start_hole"),
    between_0_and_100("course_start_hole_distribution", "pct_rounds_with_this_start"),
    between_0_and_100("course_start_hole_distribution", "pct_complete_rounds_with_this_start"),
    # silver_normalized/schema.yml
    not_null("dim_device", "device_id"),
    unique("dim_device", "device_id"),
    not_null("dim_round", "course_id"),
    not_null("dim_round", "round_id"),
    not_null("fact_telemetry_fix", "course_id"),
    not_null("fact_telemetry_fix", "round_id"),
    not_null("fact_telemetry_fix", "location_index"),
    not_null("global_course_summary", "course_id"),
    unique("global_course_summary", "course_id"),
    not_null("global_time_patterns", "course_id"),
]


def _compile_table_sql(table: str, checks: list[Check]) -> tuple[str, list[Check]]:
    """One SELECT producing one violation-count column per check."""
    cols = []
    for i, c in enumerate(checks):
        if c.unique_cols:
            struct = ", ".join(f"'{col}', {col}" for col in c.unique_cols)
            cols.append(f"COUNT(*) - COUNT(DISTINCT NAMED_STRUCT({struct})) AS c{i}")
        else:
            cols.append(f"SUM(CASE WHEN {c.violation} THEN 1 ELSE 0 END) AS c{i}")
    return f"SELECT {', '.join(cols)} FROM {table}", checks


def run_quality_checks(
    spark: SparkSession,
    checks: list[Check] | None = None,
    skip_missing_tables: bool = True,
) -> list[CheckResult]:
    """Run the suite against registered temp views; one scan per table.

    Tables not registered (e.g. gold not built) are skipped when
    `skip_missing_tables` — the result list shows only what ran.
    """
    checks = checks if checks is not None else CHECKS
    by_table: dict[str, list[Check]] = {}
    for c in checks:
        by_table.setdefault(c.table, []).append(c)

    results: list[CheckResult] = []
    for table, tchecks in by_table.items():
        try:
            spark.table(table)
        except Exception:
            if skip_missing_tables:
                continue
            raise
        sql, ordered = _compile_table_sql(table, tchecks)
        row = spark.sql(sql).collect()[0]
        for i, c in enumerate(ordered):
            v = row[f"c{i}"]
            results.append(CheckResult(table, c.name, int(v or 0)))
    return results


def assert_quality(spark: SparkSession, checks: list[Check] | None = None) -> None:
    """Raise AssertionError listing every failed check (dbt test-run
    equivalent)."""
    failed = [r for r in run_quality_checks(spark, checks) if not r.passed]
    if failed:
        lines = "\n".join(f"  {r.table}.{r.name}: {r.violations} violations" for r in failed)
        raise AssertionError(f"{len(failed)} quality checks failed:\n{lines}")
