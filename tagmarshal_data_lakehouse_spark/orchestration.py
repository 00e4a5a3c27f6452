"""Orchestration-lite: ingestion registry + idempotent backfill loop.

Ports the reference's Postgres-backed ingestion log and docker/Airflow
backfill driver (G6/G7) onto the lakehouse itself:
- registry table semantics from
  pipeline/infrastructure/database/001_create_ingestion_log.sql
  (unique (filename, ingest_date, layer); status transitions
  pending/running/success/failed/skipped; retry_count; timings) and
  pipeline/lib/tm_lakehouse/registry.py:34-229;
- pending-job discovery + retry loop from
  pipeline/scripts/backfill.py:49-262 (max 3 attempts per job),
  with the S3 prefix walk replaced by a local/bronze directory walk.

The registry lives in a small lake table (`meta.ingestion_log`) written
via MERGE upsert — no external database.  At 100 TB the registry stays
tiny (one row per file/date/layer), so every operation here is
driver-cheap; the heavy lifting stays in run_silver.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bronze_ingest import detect_file_format, validate_csv_header, validate_json_structure
from .storage import Lakehouse

INGESTION_LOG = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("course_id", T.StringType(), False),
        T.StructField("ingest_date", T.StringType(), False),
        T.StructField("layer", T.StringType(), False),
        T.StructField("rows_processed", T.LongType(), True),
        T.StructField("file_size_bytes", T.LongType(), True),
        T.StructField("file_hash", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("duration_seconds", T.DoubleType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("retry_count", T.IntegerType(), True),
    ]
)

_KEYS = ["filename", "ingest_date", "layer"]


def compute_file_hash(file_path: str) -> str | None:
    """MD5 of a file for change detection (registry.py:23-31)."""
    if not os.path.exists(file_path):
        return None
    hasher = hashlib.md5()
    with open(file_path, "rb") as f:
        for chunk in iter(lambda: f.read(8192), b""):
            hasher.update(chunk)
    return hasher.hexdigest()


class IngestionRegistry:
    """Idempotency log over a lake table (G7)."""

    TABLE = "meta.ingestion_log"

    def __init__(self, lake: Lakehouse):
        self.lake = lake
        self.spark = lake.spark

    def _log(self) -> DataFrame:
        if self.lake.exists(self.TABLE):
            return self.lake.read(self.TABLE)
        return self.spark.createDataFrame([], INGESTION_LOG)

    def is_already_ingested(self, filename: str, ingest_date: str, layer: str) -> bool:
        """registry.py:34-52 — only status='success' counts."""
        return bool(
            self._log()
            .filter(
                (F.col("filename") == filename)
                & (F.col("ingest_date") == ingest_date)
                & (F.col("layer") == layer)
                & (F.col("status") == "success")
            )
            .limit(1)
            .count()
        )

    def _upsert(self, row: dict) -> None:
        prev = (
            self._log()
            .filter(
                (F.col("filename") == row["filename"])
                & (F.col("ingest_date") == row["ingest_date"])
                & (F.col("layer") == row["layer"])
            )
            .collect()
        )
        if prev:
            p = prev[0].asDict()
            # re-running a key increments retry_count (ON CONFLICT DO
            # UPDATE ... retry_count + 1, registry.py:70-76)
            if row.get("status") == "running":
                row["retry_count"] = (p.get("retry_count") or 0) + 1
            else:
                row.setdefault("retry_count", p.get("retry_count"))
                row.setdefault("started_at", p.get("started_at"))
            merged = {**p, **row}
        else:
            merged = {f.name: None for f in INGESTION_LOG.fields}
            merged.update(row)
            if merged.get("retry_count") is None:
                merged["retry_count"] = 0
        df = self.spark.createDataFrame([tuple(merged[f.name] for f in INGESTION_LOG.fields)], INGESTION_LOG)
        self.lake.merge_upsert(self.TABLE, df, keys=_KEYS)

    def start(
        self, filename: str, course_id: str, ingest_date: str, layer: str, path: str | None = None
    ) -> None:
        from datetime import datetime, timezone

        self._upsert(
            {
                "filename": filename,
                "course_id": course_id,
                "ingest_date": ingest_date,
                "layer": layer,
                "status": "running",
                "path": path,
                "started_at": datetime.now(timezone.utc).replace(tzinfo=None),
                "completed_at": None,
                "error_message": None,
            }
        )

    def complete(
        self,
        filename: str,
        ingest_date: str,
        layer: str,
        status: str,
        rows_processed: int | None = None,
        error_message: str | None = None,
        file_size_bytes: int | None = None,
        file_hash: str | None = None,
    ) -> None:
        from datetime import datetime, timezone

        now = datetime.now(timezone.utc).replace(tzinfo=None)
        prev = (
            self._log()
            .filter(
                (F.col("filename") == filename)
                & (F.col("ingest_date") == ingest_date)
                & (F.col("layer") == layer)
            )
            .collect()
        )
        started = prev[0]["started_at"] if prev else None
        course_id = prev[0]["course_id"] if prev else ""
        duration = (now - started).total_seconds() if started else None
        self._upsert(
            {
                "filename": filename,
                "course_id": course_id,
                "ingest_date": ingest_date,
                "layer": layer,
                "status": status,
                "rows_processed": rows_processed,
                "completed_at": now,
                "duration_seconds": duration,
                "error_message": (error_message or "")[:500] or None,
                "file_size_bytes": file_size_bytes,
                "file_hash": file_hash,
            }
        )

    def summary(self) -> DataFrame:
        """ingestion_summary view analogue (001_create_ingestion_log.sql)."""
        return (
            self._log()
            .select(
                "course_id",
                "layer",
                "status",
                "rows_processed",
                "duration_seconds",
                "completed_at",
                "retry_count",
            )
            .orderBy(F.col("completed_at").desc_nulls_last())
        )


# ---------------------------------------------------------------------------
# Backfill driver (G6)
# ---------------------------------------------------------------------------


@dataclass
class BackfillResult:
    succeeded: list[tuple[str, str]]
    failed: list[tuple[str, str]]
    skipped: list[tuple[str, str]]


def discover_bronze_partitions(bronze_root: str) -> list[tuple[str, str, str]]:
    """Walk course_id=*/ingest_date=* landing-zone layout
    (backfill.py:55-90's S3 prefix walk, local-path form).
    Returns (course_id, ingest_date, path) sorted for determinism."""
    out = []
    if not os.path.isdir(bronze_root):
        return out
    for cdir in sorted(os.listdir(bronze_root)):
        if not cdir.startswith("course_id="):
            continue
        course = cdir.split("=", 1)[1]
        for ddir in sorted(os.listdir(os.path.join(bronze_root, cdir))):
            if not ddir.startswith("ingest_date="):
                continue
            date = ddir.split("=", 1)[1]
            out.append((course, date, os.path.join(bronze_root, cdir, ddir)))
    return out


def get_pending_jobs(
    registry: IngestionRegistry,
    bronze_root: str,
    course_id: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
) -> list[tuple[str, str, str]]:
    """Available bronze partitions minus registry successes
    (backfill.py:49-104)."""
    available = [
        (c, d, p)
        for c, d, p in discover_bronze_partitions(bronze_root)
        if (course_id is None or c == course_id)
        and (start_date is None or d >= start_date)
        and (end_date is None or d <= end_date)
    ]
    done = {
        (r["course_id"], r["ingest_date"])
        for r in registry._log().filter((F.col("layer") == "silver") & (F.col("status") == "success")).collect()
    }
    return [(c, d, p) for c, d, p in available if (c, d) not in done]


def validate_bronze_partition(path: str) -> None:
    """S12 gate over a landed partition: every data file must carry the
    minimal required fields (`_id`, `course`) before silver runs
    (reference ingest.py:206-304 runs this pre-upload; for files that
    reached the landing zone another way — the backfill's discovery walk —
    the gate runs here, so malformed files fail AT THE DOOR and the
    registry marks them failed instead of poisoning silver).

    Driver-side O(header) per file: only the first line / first JSON
    round is inspected, never the payload.
    """
    for fname in sorted(os.listdir(path)):
        fpath = os.path.join(path, fname)
        if not os.path.isfile(fpath) or fname.startswith(("_", ".")):
            continue
        if detect_file_format(fpath) == "csv":
            validate_csv_header(fpath)
        else:
            validate_json_structure(fpath)


def run_backfill(
    spark: SparkSession,
    lake: Lakehouse,
    bronze_root: str,
    course_id: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
    max_retries: int = 3,
    sleep_between_retries: float = 0.0,
) -> BackfillResult:
    """Sequential pending-job loop with per-job retry (backfill.py
    trigger loop, max 3 attempts) driving run_silver directly instead of
    docker-exec'ing spark-submit."""
    from .silver import run_silver

    registry = IngestionRegistry(lake)
    result = BackfillResult([], [], [])
    for course, date, path in get_pending_jobs(registry, bronze_root, course_id, start_date, end_date):
        filename = f"{course}_{date}"
        if registry.is_already_ingested(filename, date, "silver"):
            registry.complete(filename, date, "silver", "skipped")
            result.skipped.append((course, date))
            continue
        # Validation failures are PERMANENT — fail once, no retry loop
        # (a malformed header doesn't heal on attempt 2).
        try:
            validate_bronze_partition(path)
        except (ValueError, OSError) as exc:
            registry.start(filename, course, date, "silver", path=path)
            registry.complete(filename, date, "silver", "failed", error_message=str(exc))
            result.failed.append((course, date))
            continue
        ok = False
        last_error = ""
        for _attempt in range(max_retries):
            registry.start(filename, course, date, "silver", path=path)
            try:
                res = run_silver(spark, lake, path, course, date, run_id=f"backfill_{course}_{date}")
                registry.complete(filename, date, "silver", "success", rows_processed=res.rows_valid)
                ok = True
                break
            except Exception as exc:  # noqa: BLE001 — retry loop must survive any job error
                last_error = str(exc)
                registry.complete(filename, date, "silver", "failed", error_message=last_error)
                if sleep_between_retries:
                    time.sleep(sleep_between_retries)
        (result.succeeded if ok else result.failed).append((course, date))
    return result
