"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in the engine package's registry
(tagmarshal_data_lakehouse_spark/queries + /training); this module is a
thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tagmarshal_data_lakehouse_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the pricing-summary hash
    aggregate (scan -> filter pushdown -> hash agg with decimal-exact
    sums)."""
    q = registry()["agg_pricing_summary"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data extensions). Each callable takes (spark, sf_dir)."""
    return {name: q.build for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; omitted entries
    (engine-hash-based ops: minhash, simhash, LSH buckets) get the
    driver's weaker rows-only check."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
