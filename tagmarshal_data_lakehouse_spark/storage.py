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
"""

from __future__ import annotations

import os

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

    # -- reads ------------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

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

    def replace_partitions(self, table: str, df: DataFrame, partition_by: list[str]) -> None:
        """Idempotent partition rewrite: overwrite ONLY the partitions
        present in df (dynamic partitionOverwriteMode, set in session.py).
        Re-running an ingest for the same (course_id, ingest_date) yields
        the same table state — the reference's DELETE+append contract in
        one atomic-per-partition operation."""
        if not self.exists(table):
            self.write_partitioned(table, df, partition_by, mode="overwrite")
            return
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(self.path(table))
        )

    def overwrite(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Drop-and-recreate (reference S15, generate_sections_per_hole.py:112-118)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def merge_upsert(
        self,
        table: str,
        updates: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT
        (reference dimensions.py:366-398) for small dimension tables.

        Emulation: union(existing, updates) with a source-priority window
        keeping the update row per key.  Correct for dims that fit a
        full rewrite; at 100 TB fact scale you'd use replace_partitions
        (facts are insert-only here, matching the reference)."""
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
        # materialize before overwriting the directory being read
        merged_rows = merged.collect()
        out = self.spark.createDataFrame(merged_rows, existing.schema)
        self.overwrite(table, out, partition_by)
