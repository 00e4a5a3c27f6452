"""Topology inference tests (SURVEY §2.9 G1-G5) on synthetic fact data
covering the course archetypes of FIXTURES.md F8."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import dims


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "course_id string, hole_number int, section_number int"
    ).withColumn("round_id", F.lit("r"))


def _course_rows(course_id, hole_of_section, fixes_per_section=6):
    rows = []
    for section, hole in hole_of_section.items():
        rows += [(course_id, hole, section)] * fixes_per_section
    return rows


def test_infer_course_type():
    assert dims.infer_course_type(18, 54) == "18-hole"
    assert dims.infer_course_type(9, 81) == "27-hole"
    assert dims.infer_course_type(9, 40) == "18-hole-loop"
    assert dims.infer_course_type(9, 27) == "9-hole"


def test_18_hole_band_inference(spark):
    # holes 1-18 continuous, 3 sections per hole => sections 1-54
    mapping = {s: ((s - 1) // 3) + 1 for s in range(1, 55)}
    fact = _fact(spark, _course_rows("plain18", mapping))
    topos = dims.infer_topology(fact)
    t = next(t for t in topos if t.course_id == "plain18")
    assert t.course_type == "18-hole"
    assert t.nines == [(1, 1, 27), (2, 28, 54)]


def test_27_hole_reset_inference(spark):
    # 27-hole: holes reset 1-9 per nine, 3 sections/hole => 81 sections
    mapping = {s: (((s - 1) // 3) % 9) + 1 for s in range(1, 82)}
    fact = _fact(spark, _course_rows("bradshaw", mapping))
    topos = dims.infer_topology(fact)
    t = next(t for t in topos if t.course_id == "bradshaw")
    assert t.course_type == "27-hole"
    assert t.nines == [(1, 1, 27), (2, 28, 54), (3, 55, 81)]


def test_loop_course_collapses_to_9_hole_when_no_reset(spark):
    # sections 1-40, holes 1-9 with no clean reset pattern below fix noise
    mapping = {s: min(((s - 1) // 5) + 1, 9) for s in range(1, 41)}
    fact = _fact(spark, _course_rows("loopish", mapping))
    topos = dims.infer_topology(fact)
    t = next(t for t in topos if t.course_id == "loopish")
    assert t.course_type in {"9-hole", "18-hole-loop"}
    assert t.nines[0][1] == 1


def test_unit_names_and_df(spark):
    topos = [
        dims.CourseTopology("c2", "18-hole", [(1, 1, 27), (2, 28, 54)]),
        dims.CourseTopology("c3", "27-hole", [(1, 1, 27), (2, 28, 54), (3, 55, 81)]),
    ]
    df = dims.topology_to_df(spark, topos)
    rows = {(r["facility_id"], r["unit_id"]): r["unit_name"] for r in df.collect()}
    assert rows[("c2", 1)] == "Front Nine"
    assert rows[("c2", 2)] == "Back Nine"
    assert rows[("c3", 2)] == "Middle Nine"


def test_sections_per_hole(spark):
    mapping = {s: ((s - 1) // 3) + 1 for s in range(1, 19)}  # 6 holes x 3 sections
    fact = _fact(spark, _course_rows("mini", mapping, fixes_per_section=2))
    out = {
        r["hole_number"]: (r["section_start"], r["section_end"], r["sections_count"])
        for r in dims.build_sections_per_hole(fact).collect()
    }
    assert out[1] == (1, 3, 3)
    assert out[6] == (16, 18, 3)


def test_merge_upsert_topology(spark, tmp_path):
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    lake = Lakehouse(spark, str(tmp_path / "wh"))
    t1 = dims.topology_to_df(spark, [dims.CourseTopology("c1", "18-hole", [(1, 1, 27), (2, 28, 54)])])
    dims.upsert_topology(lake, t1)
    assert lake.read("silver.dim_facility_topology").count() == 2
    # second upsert updates section_end for unit 2 and adds a course
    t2 = dims.topology_to_df(
        spark,
        [
            dims.CourseTopology("c1", "18-hole", [(1, 1, 27), (2, 28, 60)]),
            dims.CourseTopology("c9", "9-hole", [(1, 1, 27)]),
        ],
    )
    dims.upsert_topology(lake, t2)
    out = lake.read("silver.dim_facility_topology")
    assert out.count() == 3
    updated = out.filter("facility_id = 'c1' AND unit_id = 2").first()
    assert updated["section_end"] == 60
