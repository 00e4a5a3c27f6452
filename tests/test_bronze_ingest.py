"""Bronze landing gate (S12) + fuzzy course matching (G8): format
detection, minimal-header validation, row counts, idempotent landing,
and the slug/containment course-match heuristics — mirroring the
reference's bronze test surface (pipeline/tests/unit/bronze/test_ingest.py)."""

from __future__ import annotations

import os

import pytest

from tagmarshal_data_lakehouse_spark import bronze_ingest as bi


# -- format detection -------------------------------------------------------


def test_detect_format_by_extension(tmp_path):
    c = tmp_path / "t.csv"
    c.write_text("header\nrow1")
    j = tmp_path / "t.json"
    j.write_text('{"k": 1}')
    assert bi.detect_file_format(str(c)) == "csv"
    assert bi.detect_file_format(str(j)) == "json"


def test_detect_format_by_content_and_default(tmp_path):
    obj = tmp_path / "a.txt"
    obj.write_text('{"k": 1}')
    arr = tmp_path / "b.txt"
    arr.write_text('[{"k": 1}]')
    plain = tmp_path / "c.txt"
    plain.write_text("plain text")
    assert bi.detect_file_format(str(obj)) == "json"
    assert bi.detect_file_format(str(arr)) == "json"
    assert bi.detect_file_format(str(plain)) == "csv"


# -- minimal validation -----------------------------------------------------


def test_validate_csv_header(tmp_path):
    ok = tmp_path / "ok.csv"
    ok.write_text("_id,course,locations[0].startTime\nr1,c1,0.5\n")
    bi.validate_csv_header(str(ok))  # no raise
    for header in ("course,x", "_id,x"):
        bad = tmp_path / "bad.csv"
        bad.write_text(f"{header}\nv1,v2\n")
        with pytest.raises(ValueError, match="missing required columns"):
            bi.validate_csv_header(str(bad))


def test_validate_json_structure(tmp_path):
    ok = tmp_path / "ok.json"
    ok.write_text('[{"_id": {"$oid": "a"}, "course": "c"}]')
    bi.validate_json_structure(str(ok))
    single = tmp_path / "single.json"
    single.write_text('{"_id": "r1", "course": "c"}')
    bi.validate_json_structure(str(single))  # single object allowed

    empty = tmp_path / "empty.json"
    empty.write_text("[]")
    with pytest.raises(ValueError, match="JSON file is empty"):
        bi.validate_json_structure(str(empty))
    no_id = tmp_path / "noid.json"
    no_id.write_text('[{"course": "c"}]')
    with pytest.raises(ValueError, match="missing required field: _id"):
        bi.validate_json_structure(str(no_id))
    no_course = tmp_path / "nocourse.json"
    no_course.write_text('[{"_id": "r1"}]')
    with pytest.raises(ValueError, match="missing required field: course"):
        bi.validate_json_structure(str(no_course))


def test_row_counts(tmp_path):
    c = tmp_path / "t.csv"
    c.write_text("_id,course\nr1,c\nr2,c\n")
    assert bi.count_csv_rows(str(c)) == 2
    empty = tmp_path / "e.csv"
    empty.write_text("_id,course\n")
    assert bi.count_csv_rows(str(empty)) == 0
    j = tmp_path / "t.json"
    j.write_text('[{"_id": "a"}, {"_id": "b"}]')
    assert bi.count_json_rows(str(j)) == 2
    s = tmp_path / "s.json"
    s.write_text('{"_id": "a"}')
    assert bi.count_json_rows(str(s)) == 1


def test_bronze_object_key():
    assert (
        bi.bronze_object_key("americanfalls", "2024-01-15", "rounds.csv")
        == "course_id=americanfalls/ingest_date=2024-01-15/rounds.csv"
    )


# -- fuzzy course matching (G8; reference ingest.py:157-203) ----------------


def test_courses_match_exact_and_empty():
    assert bi.courses_match("americanfalls", "americanfalls")
    assert bi.courses_match("", "anything")  # vacuous
    assert bi.courses_match("anything", "")
    assert bi.courses_match("AmericanFalls", "americanfalls")  # case


def test_courses_match_slug_normalization():
    # human name vs slug — the reference's canonical example
    assert bi.courses_match("americanfalls", "American Falls Golf Course")
    assert bi.courses_match("americanfalls", "The American Falls Country Club")
    assert bi.normalize_course_text("Pine & Oak Golf Club") == "pineandoak"


def test_courses_match_gc_shorthand():
    assert bi.courses_match("bradshawfarmgc", "Bradshaw Farm")
    assert bi.courses_match("bradshawfarmgc", "Bradshaw Farm Golf Club")


def test_courses_match_containment_and_negative():
    assert bi.courses_match("indiancreek", "Indian Creek South")
    assert not bi.courses_match("americanfalls", "Bradshaw Farm Golf Club")
    assert not bi.courses_match("indiancreek", "Eagle Ridge")


# -- landing (upload_file_to_bronze) ---------------------------------------


def _good_csv(tmp_path):
    p = tmp_path / "rounds.csv"
    p.write_text("_id,course\nr1,americanfalls\nr2,americanfalls\n")
    return str(p)


def test_upload_lands_file_unchanged(tmp_path):
    src = _good_csv(tmp_path)
    root = str(tmp_path / "landing")
    res = bi.upload_file_to_bronze(root, "americanfalls", src, "2024-01-15")
    assert res.row_count == 2 and res.header_ok and not res.skipped
    dest = os.path.join(root, res.key)
    assert open(dest).read() == open(src).read()  # byte-identical
    assert res.key == "course_id=americanfalls/ingest_date=2024-01-15/rounds.csv"


def test_upload_idempotent_skip(tmp_path):
    src = _good_csv(tmp_path)
    root = str(tmp_path / "landing")
    bi.upload_file_to_bronze(root, "americanfalls", src, "2024-01-15")
    res2 = bi.upload_file_to_bronze(root, "americanfalls", src, "2024-01-15")
    assert res2.skipped and res2.row_count == 0


def test_upload_rejects_missing_empty_and_bad_date(tmp_path):
    root = str(tmp_path / "landing")
    with pytest.raises(FileNotFoundError):
        bi.upload_file_to_bronze(root, "c1", str(tmp_path / "nope.csv"))
    empty = tmp_path / "empty.csv"
    empty.write_text("_id,course\n")
    with pytest.raises(ValueError, match="has no data"):
        bi.upload_file_to_bronze(root, "c1", str(empty), "2024-01-15")
    with pytest.raises(ValueError, match="Invalid ingest_date"):
        bi.upload_file_to_bronze(root, "c1", str(empty), "15-01-2024")


def test_upload_course_mismatch_warns_but_continues(tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("_id,course\nr1,Some Human Name Golf Course\n")
    root = str(tmp_path / "landing")
    res = bi.upload_file_to_bronze(root, "expectedslug", str(p), "2024-01-15")
    assert not res.skipped and res.row_count == 1
    assert res.course_mismatch == "Some Human Name Golf Course"
    # strict mode fails at the door (reference TM_STRICT_COURSE_MATCH)
    with pytest.raises(ValueError, match="Course mismatch"):
        bi.upload_file_to_bronze(
            root, "expectedslug", str(p), "2024-01-16", strict_course_match=True
        )
