"""Dimension inference and seeding (SURVEY §2.9 G1-G5, reference
pipeline/scripts/dimensions.py + generate_sections_per_hole.py).

Scale design vs the reference: the reference loops courses on the driver,
launching per-course jobs (fine for 650 courses, wasteful at scale).
Here every per-course statistic is ONE distributed aggregation over the
whole fact table; only the tiny per-(course, section) dominant-hole
frame (≤117 rows/course) is collected for the sequential reset-scan that
genuinely needs ordered iteration.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from .schemas import DIM_FACILITY_TOPOLOGY, DIM_SECTIONS_PER_HOLE


def infer_course_type(max_hole: int, max_section: int) -> str:
    """Course archetype from observed ranges (reference dimensions.py:45-54):
    holes >=10 -> 18-hole (continuous numbering); else section count
    discriminates 27-hole / 18-hole-loop / 9-hole."""
    if max_hole >= 10:
        return "18-hole"
    if max_section > 54:
        return "27-hole"
    if max_section > 27:
        return "18-hole-loop"
    return "9-hole"


def course_stats(fact: DataFrame) -> DataFrame:
    """Per-course max hole/section — one aggregation for ALL courses."""
    return fact.groupBy("course_id").agg(
        F.max("hole_number").alias("max_hole"),
        F.max("section_number").alias("max_section"),
        F.min("section_number").alias("min_section"),
    )


def hole_band_boundaries(fact: DataFrame) -> DataFrame:
    """Nine boundaries for continuous-hole (18-hole) courses: min/max
    section per hole band, all courses at once
    (reference dimensions.py:57-109 per-course loops -> one groupBy)."""
    band = (
        F.when((F.col("hole_number") >= 1) & (F.col("hole_number") <= 9), 1)
        .when((F.col("hole_number") >= 10) & (F.col("hole_number") <= 18), 2)
        .when((F.col("hole_number") >= 19) & (F.col("hole_number") <= 27), 3)
    )
    return (
        fact.withColumn("nine_number", band)
        .filter(F.col("nine_number").isNotNull())
        .groupBy("course_id", "nine_number")
        .agg(
            F.min("section_number").alias("section_start"),
            F.max("section_number").alias("section_end"),
        )
        .filter(F.col("section_start").isNotNull())
    )


def dominant_hole_per_section(fact: DataFrame, min_fixes: int = 5) -> DataFrame:
    """Noise-filtered dominant hole per (course, section) — deterministic
    mode via count + ordered row_number (ties -> lowest hole), unlike
    F.mode() whose tie-break is undefined (reference dimensions.py:118-124)."""
    counts = (
        fact.filter(F.col("section_number").isNotNull() & F.col("hole_number").isNotNull())
        .groupBy("course_id", "section_number", "hole_number")
        .agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy("course_id", "section_number").agg(F.sum("n").alias("fix_count"))
    w = W.partitionBy("course_id", "section_number").orderBy(
        F.col("n").desc(), F.col("hole_number").asc()
    )
    dominant = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("course_id", "section_number", F.col("hole_number").alias("dominant_hole"))
    )
    return dominant.join(totals, ["course_id", "section_number"]).filter(
        F.col("fix_count") >= min_fixes
    )


def _reset_scan(rows: list, max_section: int) -> list[tuple[int, int, int]]:
    """Sequential hole-reset scan over ordered (section, dominant_hole)
    rows: a reset is prev_hole>=7 followed by hole<=3
    (reference dimensions.py:131-158).  Driver-side by design — input is
    <=117 rows per course."""
    if not rows:
        return [(1, 1, max_section)]
    boundaries = [int(rows[0][0])]
    prev_hole = None
    for section, hole in rows:
        if prev_hole is not None and hole is not None and prev_hole >= 7 and int(hole) <= 3:
            boundaries.append(int(section))
        prev_hole = int(hole) if hole is not None else None
    boundaries.append(int(rows[-1][0]) + 1)
    boundaries = sorted(set(boundaries))
    nines = []
    for i in range(len(boundaries) - 1):
        start, end = boundaries[i], boundaries[i + 1] - 1
        if end >= start:
            nines.append((i + 1, start, end))
    return nines[:4]


def generate_unit_name(nine_number: int, total_nines: int) -> str:
    """Front/Middle/Back Nine naming (reference dimensions.py:161-199)."""
    if total_nines == 1:
        return "Course"
    if total_nines == 2:
        return "Front Nine" if nine_number == 1 else "Back Nine"
    if total_nines == 3:
        return {1: "Front Nine", 2: "Middle Nine", 3: "Back Nine"}.get(
            nine_number, f"Nine {nine_number}"
        )
    return f"Nine {nine_number}"


@dataclass
class CourseTopology:
    course_id: str
    course_type: str
    nines: list[tuple[int, int, int]]  # (nine_number, section_start, section_end)


def infer_topology(fact: DataFrame) -> list[CourseTopology]:
    """Infer topology for every course in the fact table.

    Distributed: course stats, hole-band boundaries and dominant-hole
    frames are each ONE Spark aggregation across all courses; the only
    collects are the small result frames.
    """
    stats = {r["course_id"]: r for r in course_stats(fact).collect()}
    bands: dict[str, list[tuple[int, int, int]]] = {}
    for r in hole_band_boundaries(fact).collect():
        bands.setdefault(r["course_id"], []).append(
            (int(r["nine_number"]), int(r["section_start"]), int(r["section_end"]))
        )
    dom: dict[str, list[tuple[int, int]]] = {}
    for r in (
        dominant_hole_per_section(fact)
        .orderBy("course_id", "section_number")
        .collect()
    ):
        dom.setdefault(r["course_id"], []).append(
            (int(r["section_number"]), r["dominant_hole"])
        )

    out: list[CourseTopology] = []
    for course_id, s in sorted(stats.items()):
        max_hole = int(s["max_hole"] or 0)
        max_section = int(s["max_section"] or 0)
        min_section = int(s["min_section"] or 1)
        ctype = infer_course_type(max_hole, max_section)
        if ctype == "18-hole":
            nines = sorted(bands.get(course_id, []))
        elif ctype in {"27-hole", "18-hole-loop"}:
            nines = _reset_scan(dom.get(course_id, []), max_section)
            if ctype == "18-hole-loop" and len(nines) == 1:
                ctype = "9-hole"
        else:
            nines = [(1, min_section, max_section)]
        if not nines:
            nines = [(1, min_section, max_section)]
        out.append(CourseTopology(course_id=course_id, course_type=ctype, nines=nines))
    return out


def topology_to_df(spark: SparkSession, topologies: list[CourseTopology]) -> DataFrame:
    """Topology rows with generated unit names -> DIM_FACILITY_TOPOLOGY
    frame (reference dimensions.py:241-292)."""
    now = F.current_timestamp()
    rows = []
    for t in topologies:
        total = len(t.nines)
        for nine_number, start, end in t.nines:
            rows.append(
                (
                    t.course_id,
                    nine_number,
                    generate_unit_name(nine_number, total),
                    nine_number,
                    start,
                    end,
                )
            )
    df = spark.createDataFrame(
        rows, "facility_id string, unit_id int, unit_name string, nine_number int, section_start int, section_end int"
    )
    return df.withColumn("created_at", now).withColumn("updated_at", now)


def build_sections_per_hole(fact: DataFrame) -> DataFrame:
    """dim_sections_per_hole: section range + count per (course, hole)
    (reference generate_sections_per_hole.py:30-63) — single groupBy."""
    return (
        fact.filter(F.col("hole_number").isNotNull() & F.col("section_number").isNotNull())
        .groupBy("course_id", "hole_number")
        .agg(
            F.min("section_number").alias("section_start"),
            F.max("section_number").alias("section_end"),
            F.countDistinct("section_number").cast("int").alias("sections_count"),
        )
    )


def upsert_topology(lake, topology_df: DataFrame) -> None:
    """MERGE-style upsert on (facility_id, unit_id) (reference
    dimensions.py:366-398)."""
    lake.merge_upsert(
        "silver.dim_facility_topology",
        lake.align_to_schema(topology_df, DIM_FACILITY_TOPOLOGY),
        keys=["facility_id", "unit_id"],
    )


def overwrite_sections_per_hole(lake, sections_df: DataFrame) -> None:
    """Drop-and-recreate (reference generate_sections_per_hole.py:112-118)."""
    lake.overwrite(
        "silver.dim_sections_per_hole",
        lake.align_to_schema(sections_df, DIM_SECTIONS_PER_HOLE),
    )


def read_course_profile_seed(spark: SparkSession, csv_path: str) -> DataFrame:
    """Typed CSV seed for dim_course_profile (reference
    dimensions.py:437-451), including the is_loop_course column the
    dashboard queries expect but the reference DDL omitted (SURVEY §1.4
    schema-drift fix).  Empty strings are normalized to NULL."""
    from .schemas import DIM_COURSE_PROFILE

    seed_schema = T.StructType([f for f in DIM_COURSE_PROFILE.fields if f.name not in ("created_at", "updated_at")])
    df = spark.read.option("header", "true").schema(seed_schema).csv(csv_path)
    for c in ["course_type", "volume_profile", "notes", "source"]:
        df = df.withColumn(c, F.when(F.col(c) == "", F.lit(None)).otherwise(F.col(c)))
    return df.withColumn("created_at", F.current_timestamp()).withColumn(
        "updated_at", F.current_timestamp()
    )


def upsert_course_profile(lake, profile_df: DataFrame) -> None:
    """MERGE upsert on course_id (reference dimensions.py:480-515)."""
    from .schemas import DIM_COURSE_PROFILE

    lake.merge_upsert(
        "silver.dim_course_profile",
        lake.align_to_schema(profile_df, DIM_COURSE_PROFILE),
        keys=["course_id"],
    )
