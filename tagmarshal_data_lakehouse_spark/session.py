"""SparkSession factory.

Replaces the reference's session builder (reference:
pipeline/lib/tm_lakehouse/spark_utils.py:17-146 — Iceberg catalog + S3A +
UTC timezone) with a local-first, Delta-if-available, Parquet-otherwise
builder.  UTC session timezone is load-bearing: the reference standardizes
all timestamps to UTC (spark_utils.py:144) and gold SQL uses
``AT TIME ZONE 'UTC'``.

Scale posture: shuffle partitions default to the core count (not Spark's
200) because local[N] has N execution slots; on a real cluster the caller
passes ``shuffle_partitions`` sized to executors*cores*2-3.  AQE is on so
post-shuffle partition counts adapt to the real data volume at any SF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)


def delta_available() -> bool:
    """True if the delta-spark package is importable (it is not in the
    minimal test container; the engine then uses Parquet tables with
    dynamic partition overwrite — see storage.py)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def get_spark(
    app_name: str = "tagmarshal_data_lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults target the local[N] harness; every knob is overridable for a
    cluster deployment.
    """
    cpus = _DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Parquet TIMESTAMP(NANOS) (events.ts in the testdata) has no Spark
        # type; read as long and convert explicitly (see queries.load_views).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "4g")
        # Idempotent partition rewrite (reference DELETE+append, etl.py:639-677)
        # is expressed as INSERT OVERWRITE of only the partitions present in
        # the incoming frame:
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    if delta_available():
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def table_format() -> str:
    """Table format used by all managed-table writes."""
    return "delta" if delta_available() else "parquet"
