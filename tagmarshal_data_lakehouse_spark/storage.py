"""Managed-table storage layer: the Delta/Iceberg role on plain Spark.

The reference uses Iceberg for ACID appends, MERGE upserts, idempotent
partition rewrites and schema evolution (SURVEY §2.1 S6-S9).  When
delta-spark is importable the same operations map 1:1 onto Delta; in this
container (no Delta) the layer provides the operational equivalents on
partitioned Parquet tables:

- `write_partitioned` + `replace_partitions`: idempotent partition
  rewrite via INSERT OVERWRITE with dynamic partitionOverwriteMode —
  one atomic-per-partition op replacing the reference's DELETE+append
  (etl.py:639-677).
- `merge_upsert`: keyed upsert emulated as union + ordered-window
  latest-wins rewrite (the plan Delta's MERGE lowers to for full-table
  merges of small dims).
- `align_to_schema`: schema evolution on append — missing columns
  null-filled, extras dropped, order fixed (etl.py:654-673).

Tables are directories under a warehouse root, registered as temp views;
partition columns are physical subdirectories so Catalyst prunes
partitions on `course_id = …` filters exactly as with Iceberg hidden
partitioning.

Schema-on-read: every write persists the table's logical schema to
`_engine_schema.json` in the table directory (the Delta/Iceberg metadata
role) and `read` applies it via `spark.read.schema(...)`.  That pins
partition-column types (a string ingest_date partition dir would
otherwise be type-INFERRED back as DATE), null-fills columns missing
from older files (additive schema evolution without a mergeSchema footer
sweep), and keeps column order stable across writes.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


class Lakehouse:
    """A warehouse root holding named partitioned Parquet tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table.replace(".", "/"))

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            not f.startswith(("_", ".")) for f in os.listdir(p)
        )

    # -- schema metadata ---------------------------------------------------

    def _schema_file(self, table: str) -> str:
        return os.path.join(self.path(table), "_engine_schema.json")

    def _load_schema(self, table: str) -> T.StructType | None:
        p = self._schema_file(table)
        if os.path.isfile(p):
            with open(p) as fh:
                return T.StructType.fromJson(json.load(fh))
        return None

    def _save_schema(self, table: str, df: DataFrame, *, reset: bool = False) -> None:
        """Persist the logical schema; appends merge ADDITIVELY (existing
        column types win, brand-new columns are appended) so evolution
        never drops or retypes columns older files still carry."""
        new = df.schema
        if not reset:
            old = self._load_schema(table)
            if old is not None:
                have = {f.name for f in old.fields}
                new = T.StructType(
                    list(old.fields) + [f for f in new.fields if f.name not in have]
                )
        with open(self._schema_file(table), "w") as fh:
            fh.write(new.json())

    # -- reads ------------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        schema = self._load_schema(table)
        reader = self.spark.read
        if schema is not None:
            # Explicit schema: no footer inference, partition-dir values
            # cast to the DECLARED type (not re-inferred), missing columns
            # in old files null-filled.
            reader = reader.schema(schema)
        return reader.parquet(self.path(table))

    def register(self, table: str, view: str | None = None) -> DataFrame:
        """Expose the table as a temp view for Spark SQL."""
        df = self.read(table)
        df.createOrReplaceTempView(view or table.replace(".", "_"))
        return df

    # -- writes -----------------------------------------------------------

    def align_to_schema(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project df onto `schema`: cast known columns, null-fill missing,
        drop unknown extras (the reference's pre-append alignment,
        etl.py:654-673)."""
        cols = []
        for field in schema.fields:
            if field.name in df.columns:
                cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
            else:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        return df.select(*cols)

    def write_partitioned(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str],
        mode: str = "append",
    ) -> None:
        (
            df.write.mode(mode)
            .partitionBy(*partition_by)
            .parquet(self.path(table))
        )
        self._save_schema(table, df, reset=(mode == "overwrite"))

    def replace_partitions(self, table: str, df: DataFrame, partition_by: list[str]) -> None:
        """Idempotent partition rewrite: overwrite ONLY the partitions
        present in df.  Re-running an ingest for the same
        (course_id, ingest_date) yields the same table state — the
        reference's DELETE+append contract in one atomic-per-partition
        operation.  partitionOverwriteMode is forced dynamic PER WRITE so
        the contract holds under any session, not just ones built by
        session.py (a static-mode session would wipe the whole table)."""
        if not self.exists(table):
            self.write_partitioned(table, df, partition_by, mode="overwrite")
            return
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(self.path(table))
        )
        self._save_schema(table, df)

    def overwrite(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Drop-and-recreate (reference S15, generate_sections_per_hole.py:112-118)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))
        self._save_schema(table, df, reset=True)

    def merge_upsert(
        self,
        table: str,
        updates: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT
        (reference dimensions.py:366-398).

        Emulation: union(existing, updates) with a source-priority window
        keeping the update row per key — the plan Delta's MERGE lowers to
        for a full-table merge.  The merged frame is written FULLY
        DISTRIBUTED to a shadow directory, then swapped in with two
        directory renames (the read of the old directory completes during
        the shadow write, so the table is never read and clobbered at
        once).  No driver collect: a large dim or a misrouted fact can't
        OOM the driver."""
        if not self.exists(table):
            self.overwrite(table, updates, partition_by)
            return
        existing = self.read(table)
        updates = self.align_to_schema(updates, existing.schema)
        merged = (
            existing.withColumn("_src", F.lit(0))
            .unionByName(updates.withColumn("_src", F.lit(1)))
            .withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy(*keys).orderBy(F.col("_src").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_src", "_rn")
        )
        shadow = table + "__tmp"
        self.overwrite(shadow, merged, partition_by)
        self._swap_in(table, shadow)

    def _swap_in(self, table: str, shadow: str) -> None:
        """Atomically replace `table`'s directory with `shadow`'s (two
        renames; readers that already resolved file paths finish on the
        __old directory before it is removed)."""
        dst, tmp = self.path(table), self.path(shadow)
        old = dst + "__old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(dst, old)
        os.rename(tmp, dst)
        shutil.rmtree(old, ignore_errors=True)

    # -- maintenance -------------------------------------------------------

    def _partition_layout(self, table: str, files: list[str]) -> list[str]:
        """Partition columns inferred from the hive `k=v` path segments
        of the table's data files (the physical truth, independent of
        how the last writer was invoked)."""
        if not files:
            return []
        rel = os.path.relpath(files[0], self.path(table))
        return [seg.split("=", 1)[0] for seg in rel.split(os.sep)[:-1] if "=" in seg]

    def table_data_files(self, table: str) -> list[str]:
        """All parquet data files under the table directory."""
        out = []
        for root, _dirs, files in os.walk(self.path(table)):
            out.extend(
                os.path.join(root, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        return out

    def compact(
        self,
        table: str,
        sort_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
        target_file_bytes: int = 128 * 1024 * 1024,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Small-file compaction + optional sort-order clustering (the
        OPTIMIZE / Iceberg rewrite_data_files role).

        Incremental ingest (one replace_partitions per (course, day) —
        or one micro-batch in streaming) accretes many small files; at
        100 TB the scan cost becomes footer-bound and the scheduler
        task-bound.  Rewrite plan:

        - no sort_cols: coalesce() to ceil(bytes / target_file_bytes)
          output files — narrow, NO shuffle, just fewer larger files;
        - with sort_cols: repartitionByRange + sortWithinPartitions so
          each output file covers a disjoint range of the sort key —
          parquet min/max stats then prune whole files for point/range
          predicates on that ONE dimension;
        - with zorder_by: same rewrite but ordered by a Morton
          bit-interleave key (operators.zorder_key), so file-contiguous
          ranges are hypercubes and min/max stats prune on ANY of the
          participating columns (the OPTIMIZE ZORDER BY role).

        The rewrite lands in a shadow directory and swaps in atomically
        (same contract as merge_upsert), so concurrent readers never see
        a half-compacted table.  Returns the number of data files after
        compaction.
        """
        if sort_cols and zorder_by:
            raise ValueError("pass sort_cols or zorder_by, not both")
        df = self.read(table)
        files = self.table_data_files(table)
        if partition_by is None:
            # preserve an existing hive layout: a rewrite must never
            # silently flatten course_id=... directories (that would
            # break downstream partition pruning)
            partition_by = self._partition_layout(table, files) or None
        total = sum(os.path.getsize(f) for f in files)
        n_files = max(1, -(-total // target_file_bytes))
        if zorder_by:
            from .operators import zorder_key

            zkey = zorder_key(df, zorder_by)
            df = (
                df.withColumn("_zkey", zkey)
                .repartitionByRange(n_files, F.col("_zkey"))
                .sortWithinPartitions("_zkey")
                .drop("_zkey")
            )
        elif sort_cols:
            df = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
            df = df.sortWithinPartitions(*sort_cols)
        else:
            df = df.coalesce(n_files)
        shadow = table + "__tmp"
        self.overwrite(shadow, df, partition_by)
        self._swap_in(table, shadow)
        return len(self.table_data_files(table))

    def vacuum(self, quarantine_keep: int = 10) -> list[str]:
        """Reclaim storage from interrupted operations and old runs.

        - `*__tmp` / `*__old` directories are leftovers of a
          merge/compact swap that died between its renames — the live
          table is whichever rename completed, so the leftovers are
          always safe to drop;
        - quarantine run tables beyond the newest `quarantine_keep`
          (run-id sorted) are pruned, bounding the quarantine footprint
          the way Iceberg's snapshot expiry bounds metadata.

        Returns the removed paths (driver-side metadata op: O(dirs),
        never touches row data).
        """
        removed: list[str] = []
        for root, dirs, _files in os.walk(self.root, topdown=True):
            for d in list(dirs):
                if d.endswith(("__tmp", "__old")):
                    p = os.path.join(root, d)
                    shutil.rmtree(p, ignore_errors=True)
                    dirs.remove(d)
                    removed.append(p)
        qdir = os.path.join(self.root, "quarantine")
        if os.path.isdir(qdir):
            runs = sorted(d for d in os.listdir(qdir) if not d.startswith(("_", ".")))
            for d in runs[:-quarantine_keep] if quarantine_keep else runs:
                p = os.path.join(qdir, d)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        return removed
