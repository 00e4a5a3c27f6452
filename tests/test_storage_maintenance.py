"""Lakehouse.compact: small-file compaction and sort-order clustering."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.storage import Lakehouse


def _fragmented_lake(spark, tmp_path, n_rows=10_000, n_files=32):
    lake = Lakehouse(spark, str(tmp_path / "warehouse"))
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 3.5).alias("v"),
    )
    lake.overwrite("bench.frag", df.repartition(n_files))
    return lake


def test_compact_reduces_file_count_preserves_data(spark, tmp_path):
    lake = _fragmented_lake(spark, tmp_path)
    before_files = lake.table_data_files("bench.frag")
    before = lake.read("bench.frag").orderBy("k").collect()
    assert len(before_files) >= 32

    n_after = lake.compact("bench.frag")
    assert n_after < len(before_files)
    after = lake.read("bench.frag").orderBy("k").collect()
    assert after == before


def test_compact_sort_clustering_gives_disjoint_file_ranges(spark, tmp_path):
    lake = _fragmented_lake(spark, tmp_path)
    lake.compact("bench.frag", sort_cols=["k"], target_file_bytes=16 * 1024)
    files = lake.table_data_files("bench.frag")
    assert len(files) > 1  # tiny target forces a multi-file layout

    # each file must cover a disjoint k-range -> parquet min/max stats
    # prune whole files for range predicates
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["k"])
        ks = t.column("k").to_pylist()
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo

    # data intact after the clustered rewrite
    total = lake.read("bench.frag").count()
    assert total == 10_000


def test_compact_preserves_schema_metadata(spark, tmp_path):
    lake = _fragmented_lake(spark, tmp_path)
    schema_before = lake.read("bench.frag").schema
    lake.compact("bench.frag")
    assert lake.read("bench.frag").schema == schema_before
