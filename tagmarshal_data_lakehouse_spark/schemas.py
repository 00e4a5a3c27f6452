"""Schemas and domain constants for the telemetry lakehouse.

Re-expressed from the reference's documented data model
(pipeline/silver/schema.md:12-56, pipeline/lib/tm_lakehouse/constants.py)
— the fact schema is declared once here and enforced at write time, where
the reference relied on create-on-first-write inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Course topology constants (reference constants.py:60-69)
EIGHTEEN_HOLE_THRESHOLD = 10
NINE_1_MAX_SECTION = 27
NINE_2_MAX_SECTION = 54
NINE_3_MAX_SECTION = 81

# Coordinate sanity bounds; rows outside are quarantined, never dropped
# (reference constants.py:78-83, etl.py:590-608)
COORD_BOUNDS = {
    "lon_min": -180.0,
    "lon_max": 180.0,
    "lat_min": -90.0,
    "lat_max": 90.0,
}

# Battery thresholds used by gold models (fact_rounds.sql:80-81)
LOW_BATTERY_PCT = 20
CRITICAL_BATTERY_PCT = 10


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# silver.fact_telemetry_event — one row per (round_id, location_index)
# (reference silver/schema.md:5-56; build at etl.py:399-474,536-569)
FACT_TELEMETRY_EVENT = T.StructType(
    [
        _f("round_id", T.StringType()),
        _f("course_id", T.StringType(), False),
        _f("ingest_date", T.StringType(), False),
        _f("fix_timestamp", T.TimestampType()),
        _f("is_location_padding", T.BooleanType(), False),
        _f("round_start_time", T.TimestampType()),
        _f("round_end_time", T.TimestampType()),
        _f("start_hole", T.IntegerType()),
        _f("start_section", T.IntegerType()),
        _f("end_section", T.IntegerType()),
        _f("is_nine_hole", T.BooleanType()),
        _f("current_nine", T.IntegerType()),
        _f("goal_time", T.IntegerType()),
        _f("is_complete", T.BooleanType()),
        _f("device", T.StringType()),
        _f("first_fix", T.StringType()),
        _f("last_fix", T.StringType()),
        _f("goal_name", T.StringType()),
        _f("goal_time_fraction", T.DoubleType()),
        _f("is_incomplete", T.BooleanType()),
        _f("is_secondary", T.BooleanType()),
        _f("is_auto_assigned", T.BooleanType()),
        _f("last_section_start", T.DoubleType()),
        _f("current_section", T.IntegerType()),
        _f("current_hole", T.IntegerType()),
        _f("current_hole_section", T.IntegerType()),
        _f("location_index", T.IntegerType(), False),
        _f("hole_number", T.IntegerType()),
        _f("section_number", T.IntegerType()),
        _f("hole_section", T.IntegerType()),
        _f("longitude", T.DoubleType()),
        _f("latitude", T.DoubleType()),
        _f("is_cache", T.BooleanType()),
        _f("is_projected", T.BooleanType()),
        _f("is_problem", T.BooleanType()),
        _f("pace_gap", T.DoubleType()),
        _f("positional_gap", T.DoubleType()),
        _f("pace", T.DoubleType()),
        _f("battery_percentage", T.DoubleType()),
        _f("event_date", T.DateType()),
        _f("round_duration_minutes", T.DoubleType()),
        _f("event_year", T.IntegerType()),
        _f("event_month", T.IntegerType()),
        _f("event_day", T.IntegerType()),
        _f("event_weekday", T.IntegerType()),  # Spark convention: 1=Sunday
        _f("nine_number", T.IntegerType()),
        _f("geometry_wkt", T.StringType()),
        _f("is_timestamp_missing", T.BooleanType(), False),
    ]
)

# silver.dim_facility_topology (reference dimensions.py:313-327)
DIM_FACILITY_TOPOLOGY = T.StructType(
    [
        _f("facility_id", T.StringType(), False),
        _f("unit_id", T.IntegerType(), False),
        _f("unit_name", T.StringType()),
        _f("nine_number", T.IntegerType()),
        _f("section_start", T.IntegerType()),
        _f("section_end", T.IntegerType()),
        _f("created_at", T.TimestampType()),
        _f("updated_at", T.TimestampType()),
    ]
)

# silver.dim_course_profile (reference dimensions.py:459-473 + the
# is_loop_course column consumers expect — SURVEY §1.4 schema-drift fix)
DIM_COURSE_PROFILE = T.StructType(
    [
        _f("course_id", T.StringType(), False),
        _f("course_type", T.StringType()),
        _f("is_loop_course", T.BooleanType()),
        _f("volume_profile", T.StringType()),
        _f("peak_season_start_month", T.IntegerType()),
        _f("peak_season_end_month", T.IntegerType()),
        _f("notes", T.StringType()),
        _f("source", T.StringType()),
        _f("created_at", T.TimestampType()),
        _f("updated_at", T.TimestampType()),
    ]
)

# silver.dim_sections_per_hole (reference generate_sections_per_hole.py:53-61)
DIM_SECTIONS_PER_HOLE = T.StructType(
    [
        _f("course_id", T.StringType(), False),
        _f("hole_number", T.IntegerType(), False),
        _f("section_start", T.IntegerType()),
        _f("section_end", T.IntegerType()),
        _f("sections_count", T.IntegerType()),
    ]
)
