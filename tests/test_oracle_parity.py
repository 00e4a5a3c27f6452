"""Every oracle-declared registry query must match DuckDB exactly at
sf0.001 (fast inner loop; the driver checks sf0.01 — same data generator,
so parity here predicts parity there).

Set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 to run at driver scale.
"""

from __future__ import annotations

import os

import pytest

from tagmarshal_data_lakehouse_spark.queries import registry

from .oracle_harness import run_query_pair

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

_REGISTRY = registry()
_ORACLE_QUERIES = [name for name, q in _REGISTRY.items() if q.oracle is not None]
_ROWS_ONLY = [name for name, q in _REGISTRY.items() if q.oracle is None]


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    problems = run_query_pair(spark, _REGISTRY[name], SF_DIR)
    assert not problems, f"{name} diverges from oracle: {problems}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = _REGISTRY[name].build(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert df.schema.fieldNames()  # stable schema


def test_load_views_does_not_mutate_caller_conf(spark):
    """load_views must scope NTZ inference to its own reads (parquet
    reader option), never flip the caller session's
    inferTimestampNTZ conf — a session-level set here would silently
    change the inferred type of the caller's own later unadjusted-UTC
    parquet reads."""
    from pyspark.sql.types import TimestampNTZType

    from tagmarshal_data_lakehouse_spark.queries import load_views

    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    original = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        # subset of tables -> a fresh idempotency marker, so the loader
        # actually runs instead of returning early
        load_views(spark, SF_DIR, tables=("events", "orders"))
        assert spark.conf.get(key) == "false", "load_views flipped the session conf"
        # and the view still reads NTZ despite the conf being off
        assert isinstance(
            spark.table("events").schema["ts"].dataType, TimestampNTZType
        )
    finally:
        spark.conf.set(key, original)
        load_views(spark, SF_DIR)  # restore full view set for other tests
