"""Synthetic round-document fixtures per FIXTURES.md (F1-F4, F8).

Deterministic generators for the bronze input shapes: plain JSON rounds,
MongoDB-extended JSON, ragged flattened CSVs (varying slot counts and
column order, padding slots, missing timestamps), invalid coordinates,
and duplicate cached fixes.
"""

from __future__ import annotations

import csv
import json
import os


def _locations(n: int, *, start_lon: float = -122.1, start_lat: float = 45.6) -> list[dict]:
    locs = []
    for i in range(n):
        locs.append(
            {
                "hole": (i // 3) + 1,
                "sectionNumber": i + 1,
                "holeSection": (i % 3) + 1,
                "startTime": 60.0 * i + 0.5,
                "fixCoordinates": [start_lon + i * 0.001, start_lat + i * 0.001],
                "isProjected": i % 5 == 0,
                "isProblem": False,
                "isCache": i % 4 == 0,
                "paceGap": 0.5 + i * 0.1,
                "positionalGap": 0.3,
                "pace": 4.0 + i * 0.05,
                "batteryPercentage": 95.0 - i,
            }
        )
    return locs


def write_plain_json(path: str) -> int:
    """F1: two plain rounds; second has empty locations (valid bronze)."""
    rounds = [
        {
            "_id": "round001",
            "course": "americanfalls",
            "startTime": "2024-01-15T10:00:00Z",
            "endTime": "2024-01-15T14:10:00Z",
            "startHole": 1,
            "startSection": 1,
            "endSection": 27,
            "isNineHole": False,
            "complete": True,
            "goalTime": 15840,
            "currentNine": 1,
            "device": "dev-42",
            "goalName": "Default",
            "goalTimeFraction": 0.5,
            "isIncomplete": False,
            "isSecondary": False,
            "isAutoAssigned": False,
            "lastSectionStart": 123.4,
            "currentSection": 5,
            "currentHole": 2,
            "currentHoleSection": 1,
            "locations": _locations(27),
        },
        {
            "_id": "round002",
            "course": "americanfalls",
            "startTime": "2024-01-16T09:00:00Z",
            "startHole": 1,
            "complete": False,
            "locations": _locations(9),
        },
    ]
    with open(path, "w") as f:
        json.dump(rounds, f)
    return len(rounds)


def write_mongo_json(path: str) -> int:
    """F2: $oid/$date wrappers; one round missing the $oid subfield
    entirely (schema-variance trap) and one with invalid coordinates +
    duplicate cached fixes (F4)."""
    dup_locs = _locations(6)
    # duplicate of slot 2 differing in cache/battery: survivor must be the
    # cached, non-projected, higher-battery record
    rounds = [
        {
            "_id": {"$oid": "507f1f77bcf86cd799439011"},
            "course": "bradshawfarmgc",
            "startTime": {"$date": "2024-02-01T08:00:00Z"},
            "endTime": {"$date": "2024-02-01T12:30:00Z"},
            "startHole": 1,
            "complete": True,
            "goalTime": 16000,
            "locations": dup_locs,
        },
        {
            "_id": {"$oid": "507f1f77bcf86cd799439012"},
            "course": "bradshawfarmgc",
            "startTime": {"$date": "2024-02-01T09:00:00Z"},
            "locations": [
                {
                    "hole": 1,
                    "sectionNumber": 1,
                    "holeSection": 1,
                    "startTime": 10.0,
                    "fixCoordinates": [200.0, 100.0],  # invalid -> quarantine
                    "isProjected": False,
                    "isProblem": False,
                    "isCache": False,
                    "paceGap": 0.1,
                    "positionalGap": 0.1,
                    "pace": 3.0,
                    "batteryPercentage": 80.0,
                },
                {
                    "hole": 2,
                    "sectionNumber": 4,
                    "holeSection": 1,
                    "startTime": 600.0,
                    "fixCoordinates": [-122.0, 45.0],
                    "isProjected": False,
                    "isProblem": False,
                    "isCache": True,
                    "paceGap": 0.2,
                    "positionalGap": 0.2,
                    "pace": 3.5,
                    "batteryPercentage": 70.0,
                },
            ],
        },
    ]
    with open(path, "w") as f:
        json.dump(rounds, f)
    return len(rounds)


CSV_FIELDS = [
    "hole",
    "sectionNumber",
    "holeSection",
    "startTime",
    "date",
    "fixCoordinates[0]",
    "fixCoordinates[1]",
    "isProjected",
    "isProblem",
    "isCache",
    "paceGap",
    "positionalGap",
    "pace",
    "batteryPercentage",
]


def _csv_row(round_id: str, course: str, start_time: str, n_slots: int, k_cols: int, *, pad_from: int | None = None, no_dates: bool = False) -> dict:
    row = {
        "_id": round_id,
        "course": course,
        "startTime": start_time,
        "startHole": 1,
        "goalTime": 15000,
        "complete": "true",
    }
    for i in range(k_cols):
        if i < n_slots:
            is_pad = pad_from is not None and i >= pad_from
            row[f"locations[{i}].hole"] = "" if is_pad else str((i // 3) + 1)
            row[f"locations[{i}].sectionNumber"] = "" if is_pad else str(i + 1)
            row[f"locations[{i}].holeSection"] = "" if is_pad else str((i % 3) + 1)
            row[f"locations[{i}].startTime"] = str(60.0 * i)
            row[f"locations[{i}].date"] = (
                "" if (no_dates or is_pad) else f"2024-03-0{1 + (i % 5)}T10:{i:02d}:00Z"
            )
            row[f"locations[{i}].fixCoordinates[0]"] = "" if is_pad else str(-122.1 + i * 0.001)
            row[f"locations[{i}].fixCoordinates[1]"] = "" if is_pad else str(45.6 + i * 0.001)
            row[f"locations[{i}].isProjected"] = "false"
            row[f"locations[{i}].isProblem"] = "false"
            row[f"locations[{i}].isCache"] = "true" if i % 2 == 0 else "false"
            row[f"locations[{i}].paceGap"] = str(0.5 + i * 0.1)
            row[f"locations[{i}].positionalGap"] = "0.3"
            row[f"locations[{i}].pace"] = str(4.0 + i * 0.05)
            row[f"locations[{i}].batteryPercentage"] = str(90 - i)
        else:
            for fld in CSV_FIELDS:
                row[f"locations[{i}].{fld}"] = ""
    return row


def write_ragged_csvs(dirpath: str) -> int:
    """F3: two CSVs with different K and column order; padding slots;
    one round with NO fix dates AND no round startTime -> NULL
    fix_timestamp rows."""
    os.makedirs(dirpath, exist_ok=True)
    # file A: K=6 slots, padding from slot 4
    row_a = _csv_row("csvround01", "indiancreek", "2024-03-01T09:00:00Z", 6, 6, pad_from=4)
    cols_a = list(row_a.keys())
    with open(os.path.join(dirpath, "a.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols_a)
        w.writeheader()
        w.writerow(row_a)
    # file B: K=4 slots, REVERSED column order, missing dates + startTime
    row_b = _csv_row("csvround02", "indiancreek", "", 4, 4, no_dates=True)
    row_b["startTime"] = ""
    cols_b = list(reversed(list(row_b.keys())))
    with open(os.path.join(dirpath, "b.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols_b)
        w.writeheader()
        w.writerow(row_b)
    return 2


def write_topology_seed(path: str) -> None:
    """F5: seeds for an 18-hole, a 27-hole and a 9-hole-loop course."""
    rows = [
        ("indiancreek", 1, "Front Nine", 1, 1, 27),
        ("indiancreek", 2, "Back Nine", 2, 28, 54),
        ("bradshawfarmgc", 1, "Front Nine", 1, 1, 27),
        ("bradshawfarmgc", 2, "Middle Nine", 2, 28, 54),
        ("bradshawfarmgc", 3, "Back Nine", 3, 55, 81),
        ("americanfalls", 1, "Course", 1, 1, 27),
        ("americanfalls", 2, "Course", 2, 1, 27),
    ]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["facility_id", "unit_id", "unit_name", "nine_number", "section_start", "section_end"])
        w.writerows(rows)


def write_course_profile_seed(path: str) -> None:
    """Course profile seed incl. is_loop_course (SURVEY §1.4 drift fix)."""
    rows = [
        ("americanfalls", "9-hole-loop", "true", "low", 5, 9, "9 holes played twice", "seed"),
        ("indiancreek", "18-hole", "false", "high", 4, 10, "", "seed"),
        ("bradshawfarmgc", "27-hole", "false", "medium", 3, 11, "three nines", "seed"),
    ]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            [
                "course_id",
                "course_type",
                "is_loop_course",
                "volume_profile",
                "peak_season_start_month",
                "peak_season_end_month",
                "notes",
                "source",
            ]
        )
        w.writerows(rows)
