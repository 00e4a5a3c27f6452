"""Bronze landing: file validation + fuzzy course matching + idempotent upload.

Ports the reference's landing-zone gate (S12 + G8):
- format detection, minimal-header validation (`_id`, `course`), row
  counting: pipeline/bronze/ingest.py:40-116;
- course-name fuzzy matching (slug normalization, golf-stopword strip,
  "gc" shorthand, containment): pipeline/bronze/ingest.py:157-203;
- idempotent upload with skip-if-exists: pipeline/bronze/ingest.py:206-304.

This is deliberately driver-side plain Python: the gate runs BEFORE any
Spark job (one small file at a time, pre-landing), exactly as the
reference runs it client-side before S3 upload.  The landing zone here is
the local `course_id=…/ingest_date=…/<file>` layout that
`orchestration.discover_bronze_partitions` walks — the same layout the
reference uses as its S3 key scheme (ingest.py:118-120).  The file is
landed byte-for-byte unchanged (NO DATA LOSS: all rows, all columns, all
NULLs preserved); silver handles everything else.

At scale this gate is O(file) driver work per landing and never touches
the cluster; the 100 TB path stays in run_silver.
"""

from __future__ import annotations

import csv
import json
import os
import re
import shutil
from dataclasses import dataclass
from datetime import date


@dataclass(frozen=True)
class BronzeUploadResult:
    """Result of a bronze landing (reference ingest.py:29-37)."""

    bronze_root: str
    key: str
    row_count: int
    header_ok: bool
    skipped: bool  # True when the file was already landed (idempotency)
    course_mismatch: str | None = None  # sampled course that failed the match


# ---------------------------------------------------------------------------
# Format detection + minimal validation (S12; reference ingest.py:40-99)
# ---------------------------------------------------------------------------


def detect_file_format(path: str) -> str:
    """"csv" or "json" from extension, else from the first byte."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        return "json"
    if ext == ".csv":
        return "csv"
    with open(path) as f:
        if f.read(1).strip() in "[{":
            return "json"
    return "csv"


def validate_csv_header(path: str) -> None:
    """Require only the absolute minimum columns (`_id`, `course`) so no
    data is ever rejected for shape — silver handles the rest."""
    with open(path, newline="") as f:
        header = next(csv.reader(f))
    missing = [c for c in ("_id", "course") if c not in header]
    if missing:
        raise ValueError(f"CSV header missing required columns: {missing}")


def validate_json_structure(path: str) -> None:
    """Require `_id` (string or Mongo `{"$oid": …}`) and `course` on the
    first round of a JSON export (object or array)."""
    with open(path) as f:
        data = json.load(f)
    rounds = data if isinstance(data, list) else [data]
    if not rounds:
        raise ValueError("JSON file is empty")
    first = rounds[0]
    if "_id" not in first:
        raise ValueError("JSON missing required field: _id")
    if "course" not in first:
        raise ValueError("JSON missing required field: course")


def count_csv_rows(path: str) -> int:
    """Data rows, header excluded."""
    with open(path, newline="") as f:
        next(f)
        return sum(1 for _ in f)


def count_json_rows(path: str) -> int:
    with open(path) as f:
        data = json.load(f)
    return len(data) if isinstance(data, list) else 1


def bronze_object_key(course_id: str, ingest_date: str, filename: str) -> str:
    """course_id=…/ingest_date=YYYY-MM-DD/<filename> — the layout
    discover_bronze_partitions walks (reference ingest.py:118-120)."""
    return f"course_id={course_id}/ingest_date={ingest_date}/{filename}"


def _validate_ingest_date(ingest_date: str) -> None:
    try:
        date.fromisoformat(ingest_date)
    except Exception:
        raise ValueError(f"Invalid ingest_date (expected YYYY-MM-DD): {ingest_date}") from None


def _sample_course_from_csv(path: str) -> str | None:
    """First non-empty `course` value (reference ingest.py:133-142)."""
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            v = (row.get("course") or "").strip()
            if v:
                return v
    return None


def _sample_course_from_json(path: str) -> str | None:
    with open(path) as f:
        data = json.load(f)
    for r in data if isinstance(data, list) else [data]:
        v = (r.get("course") or "").strip() if isinstance(r, dict) else ""
        if v:
            return v
    return None


# ---------------------------------------------------------------------------
# Fuzzy course matching (G8; reference ingest.py:157-203)
# ---------------------------------------------------------------------------


def normalize_course_text(value: str) -> str:
    """Human name or slug → comparable slug.

    Heuristic by design: sources carry names like "American Falls Golf
    Course" while pipeline ids are slugs like "americanfalls".  Lowercase,
    `&`→"and", strip punctuation, drop generic golf words, join.
    """
    v = (value or "").strip().lower()
    if not v:
        return ""
    v = v.replace("&", " and ")
    v = re.sub(r"[^a-z0-9]+", " ", v)
    stop = {"golf", "course", "club", "country", "the"}
    return "".join(t for t in v.split() if t and t not in stop)


def courses_match(course_id: str, sampled_course: str) -> bool:
    """Best-effort match between a requested id and a sampled course name.

    Vacuously true when either side is empty (can't disprove), exact or
    slug-equal otherwise, with the reference's "gc" golf-club shorthand
    and substring-containment fallbacks (ingest.py:177-203).
    """
    a_raw = (course_id or "").strip().lower()
    b_raw = (sampled_course or "").strip().lower()
    if not a_raw or not b_raw:
        return True
    if a_raw == b_raw:
        return True
    a = normalize_course_text(a_raw)
    b = normalize_course_text(b_raw)
    if not a or not b:
        return True
    if a == b:
        return True
    if a.endswith("gc") and len(a) > 2:
        a2 = a[:-2]
        if a2 == b or b.startswith(a2) or a2.startswith(b) or a2 in b or b in a2:
            return True
    return a in b or b in a


# ---------------------------------------------------------------------------
# Landing (reference ingest.py:206-304, local-directory form)
# ---------------------------------------------------------------------------


def upload_file_to_bronze(
    bronze_root: str,
    course_id: str,
    local_path: str,
    ingest_date: str | None = None,
    skip_if_exists: bool = True,
    strict_course_match: bool = False,
) -> BronzeUploadResult:
    """Validate a CSV/JSON export and land it in the bronze layout.

    1. Detect format; 2. validate minimal required fields (`_id`,
    `course`); 3. count rows; 4. fuzzy-check the sampled course against
    the requested id (warn-and-continue unless strict — the reference's
    TM_STRICT_COURSE_MATCH switch); 5. copy the file UNCHANGED into
    `course_id=…/ingest_date=…/` (skipping when already landed).

    Raises FileNotFoundError / ValueError exactly where the reference
    does, so `run_backfill`'s registry marks such files `failed` at the
    door instead of letting them into silver.
    """
    if ingest_date is None:
        ingest_date = date.today().isoformat()
    _validate_ingest_date(ingest_date)
    if not os.path.exists(local_path):
        raise FileNotFoundError(local_path)

    fmt = detect_file_format(local_path)
    if fmt == "csv":
        validate_csv_header(local_path)
        row_count = count_csv_rows(local_path)
        sampled = _sample_course_from_csv(local_path)
    else:
        validate_json_structure(local_path)
        row_count = count_json_rows(local_path)
        sampled = _sample_course_from_json(local_path)

    mismatch = None
    if sampled and not courses_match(course_id, sampled):
        mismatch = sampled
        if strict_course_match:
            raise ValueError(
                f"Course mismatch: file contains course '{sampled}' "
                f"but parameter is '{course_id}'"
            )

    if row_count <= 0:
        raise ValueError(f"{fmt.upper()} file has no data")

    key = bronze_object_key(course_id, ingest_date, os.path.basename(local_path))
    dest = os.path.join(bronze_root, key)
    if skip_if_exists and os.path.exists(dest):
        return BronzeUploadResult(bronze_root, key, 0, True, True, mismatch)

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copyfile(local_path, dest)  # byte-for-byte, no transformation
    return BronzeUploadResult(bronze_root, key, row_count, True, False, mismatch)
