"""DuckDB oracle parity for the gold model DAG.

The 20 gold models are declared as Spark SQL texts (gold/models.py).
This suite executes the SAME texts on DuckDB — after defining a small
set of compatibility macros for the function names DuckDB spells
differently (oracle_harness.SPARK_DIALECT_MACROS) — over the identical
silver parquet, materializing the DAG in dependency order, then
compares every model's full result frame value-by-value.  That turns
the gold surface from hand-written-expectation tests into a hard
two-engine oracle, the same standard the relational/events/tpch
queries already meet.

Reference contracts mirrored: grain per pipeline/gold/models/gold/
schema.yml:8-10; the coverage-audit reconciliation of
gold_coverage_audit.sql.

Approximate-sketch columns (median_* via percentile_approx) are
engine-specific by construction and are excluded from the value
compare; everything else — counts, sums, averages, rates, rounded
percentages, arrays, labels, timestamps — must agree.
"""

from __future__ import annotations

import duckdb
import pytest

from tagmarshal_data_lakehouse_spark import dims, silver
from tagmarshal_data_lakehouse_spark.gold import models as gold_models
from tagmarshal_data_lakehouse_spark.gold.models import MODELS, GoldBuilder
from tagmarshal_data_lakehouse_spark.sources import bronze

from . import fixtures_gen
from .oracle_harness import SPARK_DIALECT_MACROS, compare_tolerant, spark_sql_to_duckdb

MODEL_NAMES = [m.name for m in MODELS]


@pytest.fixture(scope="module")
def gold_pair(spark, tmp_path_factory):
    """(spark_built, duckdb_con) with every model materialized on both
    engines from the same silver parquet."""
    d = tmp_path_factory.mktemp("gold_oracle")
    json_dir = d / "json_plain"
    json_dir.mkdir()
    fixtures_gen.write_plain_json(str(json_dir / "rounds.json"))
    mongo_dir = d / "json_mongo"
    mongo_dir.mkdir()
    fixtures_gen.write_mongo_json(str(mongo_dir / "rounds.json"))
    csv_dir = d / "csv_ragged"
    fixtures_gen.write_ragged_csvs(str(csv_dir))

    parts = []
    for sub, course in [
        ("json_plain", "americanfalls"),
        ("json_mongo", "mongocourse"),
        ("csv_ragged", "csvcourse"),
    ]:
        raw, fmt = bronze.read_rounds(spark, str(d / sub))
        parts.append(silver.transform_rounds(raw, fmt, course, "2024-01-16", None))
    # a low-battery clone course so device_health_errors and the
    # battery-tier quality columns exercise non-empty paths
    from pyspark.sql import functions as F

    parts.append(
        parts[0]
        .withColumn("course_id", F.lit("lowbattcourse"))
        .withColumn("battery_percentage", F.col("battery_percentage") * 0.1)
    )
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionByName(p, allowMissingColumns=True)
    topo = dims.topology_to_df(spark, dims.infer_topology(fact))

    # both engines read the identical parquet bytes
    fact_path = str(d / "fact_telemetry_event.parquet")
    topo_path = str(d / "dim_facility_topology.parquet")
    fact.write.parquet(fact_path)
    topo.write.parquet(topo_path)

    spark_built = GoldBuilder(spark).build(
        spark.read.parquet(fact_path), spark.read.parquet(topo_path)
    )

    con = duckdb.connect()
    for stmt in SPARK_DIALECT_MACROS:
        con.execute(stmt)
    con.execute(
        f"CREATE VIEW fact_telemetry_event AS SELECT * FROM '{fact_path}/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW dim_facility_topology AS SELECT * FROM '{topo_path}/*.parquet'"
    )
    for m in MODELS:  # already topologically ordered
        con.execute(f"CREATE TABLE {m.name} AS {spark_sql_to_duckdb(m.sql)}")
    yield spark_built, con
    con.close()


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_gold_model_matches_duckdb(gold_pair, name):
    spark_built, con = gold_pair
    sdf = spark_built[name].toPandas()
    odf = con.table(name).fetchdf()
    assert len(sdf) > 0, f"{name}: fixture produced an empty model"
    problems = compare_tolerant(sdf, odf)
    assert not problems, f"{name}: {problems[:3]}"


def test_gold_models_all_covered():
    """Every declared model is part of the oracle matrix."""
    assert len(MODEL_NAMES) == len(gold_models.MODELS) == 20
