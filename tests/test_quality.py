"""Quality harness tests: the ported dbt suite must pass on
fixture-built silver+gold, catch seeded violations, and run as one scan
per table."""

from __future__ import annotations

import pytest

from tagmarshal_data_lakehouse_spark import dims, quality, silver
from tagmarshal_data_lakehouse_spark.queries import telemetry
from tagmarshal_data_lakehouse_spark.sources import bronze

from . import fixtures_gen


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("quality_bronze")
    json_dir = d / "json_plain"
    json_dir.mkdir()
    fixtures_gen.write_plain_json(str(json_dir / "rounds.json"))
    fixtures_gen.write_course_profile_seed(str(d / "profile.csv"))
    raw, fmt = bronze.read_rounds(spark, str(d / "json_plain"))
    fact = silver.transform_rounds(raw, fmt, "americanfalls", "2024-01-16", None).cache()
    topo = dims.topology_to_df(spark, dims.infer_topology(fact))
    profile = dims.read_course_profile_seed(spark, str(d / "profile.csv"))
    sections = dims.build_sections_per_hole(fact)
    telemetry.register_views(spark, fact, topo, profile, sections, build_gold=True)
    return fact


def test_full_suite_passes(spark, built):
    results = quality.run_quality_checks(spark)
    failed = [r for r in results if not r.passed]
    assert not failed, failed
    # every table in the suite was actually present and scanned
    assert {r.table for r in results} == {c.table for c in quality.CHECKS}


def test_assert_quality_passes(spark, built):
    quality.assert_quality(spark)


def test_catches_not_null_violation(spark, built):
    spark.sql(
        "SELECT CAST(NULL AS STRING) AS course_id, 'r1' AS round_id"
    ).createOrReplaceTempView("_bad_nn")
    res = quality.run_quality_checks(spark, [quality.not_null("_bad_nn", "course_id")])
    assert res[0].violations == 1


def test_catches_duplicate_grain(spark, built):
    spark.sql(
        "SELECT * FROM VALUES ('r1', 0), ('r1', 0), ('r1', 1) AS t(round_id, location_index)"
    ).createOrReplaceTempView("_bad_dup")
    res = quality.run_quality_checks(
        spark, [quality.unique_combination("_bad_dup", "round_id", "location_index")]
    )
    assert res[0].violations == 1


def test_catches_range_violation(spark, built):
    spark.sql(
        "SELECT * FROM VALUES (91.0), (45.0), (CAST(NULL AS DOUBLE)) AS t(latitude)"
    ).createOrReplaceTempView("_bad_range")
    res = quality.run_quality_checks(
        spark, [quality.accepted_range("_bad_range", "latitude", -90, 90)]
    )
    assert res[0].violations == 1  # NULL is not a violation (dbt semantics)


def test_missing_table_skipped(spark, built):
    res = quality.run_quality_checks(
        spark, [quality.not_null("_no_such_table_xyz", "c")], skip_missing_tables=True
    )
    assert res == []
    with pytest.raises(Exception):
        quality.run_quality_checks(
            spark, [quality.not_null("_no_such_table_xyz", "c")], skip_missing_tables=False
        )


def test_one_scan_per_table(spark, built):
    """All fact_telemetry_event checks must compile into a single SELECT."""
    checks = [c for c in quality.CHECKS if c.table == "fact_telemetry_event"]
    sql, ordered = quality._compile_table_sql("fact_telemetry_event", checks)
    assert sql.count("FROM fact_telemetry_event") == 1
    assert len(ordered) == len(checks)


def test_corpus_keywords_concentration_beats_dispersion(spark):
    """A term heavily used in few docs must outrank an equally-frequent
    term spread across all docs; hapax terms never rank."""
    from tagmarshal_data_lakehouse_spark.training.text import corpus_keywords

    rows = []
    for i in range(10):
        common = "filler alpha beta"          # df=10
        rows.append((i, f"{common} {'quantum ' * 5}" if i < 2 else f"{common} plain words here"))
    rows.append((99, "hapaxword only once"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus_keywords(docs, top_k=10, min_df=2).collect()
    scores = {r["term"]: (r["score"], r["term_df"], r["tf_total"]) for r in out}
    assert "hapaxword" not in scores
    # quantum: tf=10, df=2, N=11 -> 10*(11/2)=55; filler: tf=10, df=10 -> 11
    assert scores["quantum"][0] > scores["filler"][0]
    assert out[0]["term"] == "quantum"
