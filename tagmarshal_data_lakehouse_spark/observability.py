"""Run-summary observability sink (reference observability.py:21-34 +
etl.py:688-703).

One JSON document per pipeline run, landed under the warehouse's
`observability/` prefix with the reference's key scheme
(`<stage>/course_id=…/ingest_date=…/run_id=….json`) and field names
(`stage`, `run_id`, `ts`, then the stage payload: `course_id`,
`ingest_date`, `landing_uri`, `valid_count`, `invalid_count`, `table`).

Driver-side by design: the payload is one row that the driver already
holds (counts ride the write via Observation, silver.py:370-380), so a
Spark job here would be a 1-row job per run — pure overhead at any
scale.  The directory itself is query-able as a table
(`spark.read.json(<root>/observability/silver)`) when the run history
grows, which is the reference's read path too.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone


def obs_key(stage: str, *parts: str) -> str:
    """Key path under the observability prefix (reference obs_key)."""
    return "/".join([stage, *[p.strip("/") for p in parts if p.strip("/")]])


def write_run_summary(obs_root: str, stage: str, run_id: str, payload: dict) -> str:
    """Write a run summary JSON; returns the file path written."""
    doc = {
        "stage": stage,
        "run_id": run_id,
        "ts": datetime.now(timezone.utc).isoformat(),
        **payload,
    }
    key = obs_key(
        stage,
        f"course_id={payload['course_id']}" if "course_id" in payload else "",
        f"ingest_date={payload['ingest_date']}" if "ingest_date" in payload else "",
        f"run_id={run_id}.json",
    )
    path = os.path.join(obs_root, key)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # newline-delimited single-record file: spark.read.json reads the
    # whole observability/<stage> tree as one history table
    with open(path, "w") as fh:
        fh.write(json.dumps(doc, default=str) + "\n")
    return path
