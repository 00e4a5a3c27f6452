"""Physical-plan contracts: the optimizations the 100 TB design depends
on must be visible in the executed plan, not assumed.

Each test pins one property: filter/column pushdown into the parquet
scan, broadcast (not shuffle) joins for dims, map-side partial
aggregation, shuffle-free row-local operators, and whole-stage codegen
coverage of the hot expressions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.queries import load_views, registry


@pytest.fixture(scope="module")
def reg():
    return registry()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    load_views(spark, sf_smoke)
    df = spark.table("lineitem").filter(F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag", "l_quantity"
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_smoke):
    load_views(spark, sf_smoke)
    df = spark.table("lineitem").select("l_returnflag", "l_quantity")
    plan = _plan(df)
    # ReadSchema carries only the projected columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_returnflag" in read[0] and "l_extendedprice" not in read[0]


def test_dim_joins_broadcast_not_shuffle(spark, sf_smoke, reg):
    plan = _plan(reg["join_broadcast"].build(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_is_broadcast_nested_loop(spark, sf_smoke, reg):
    plan = _plan(reg["join_range_broadcast"].build(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in plan


def test_pricing_summary_partial_aggregation(spark, sf_smoke, reg):
    # map-side combine: HashAggregate appears below AND above the exchange
    plan = _plan(reg["agg_pricing_summary"].build(spark, sf_smoke))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(l_returnflag" in plan


def test_sampling_ops_are_shuffle_free(spark, sf_smoke, reg):
    for name in ("doc_train_split", "doc_pii_scan"):
        plan = _plan(reg[name].build(spark, sf_smoke))
        assert "Exchange" not in plan, f"{name} must stay row-local"


def test_hash_sample_is_take_ordered(spark, sf_smoke, reg):
    plan = _plan(reg["doc_hash_sample_k"].build(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_asof_join_has_no_join_operator(spark, sf_smoke, reg):
    plan = _plan(reg["events_asof_join"].build(spark, sf_smoke))
    assert "Join" not in plan  # union-and-carry window, not an inequality join


def test_decontaminate_broadcasts_eval_side(spark, sf_smoke, reg):
    plan = _plan(reg["doc_decontaminate"].build(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan  # corpus gram stream never shuffles for the join


def test_hot_scans_are_codegen(spark, sf_smoke, reg):
    # codegen spans only appear in the FINAL adaptive plan, and only the
    # DataFrame's own execution finalizes it (count() plans separately)
    df = reg["agg_pricing_summary"].build(spark, sf_smoke)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # "*(n)" prefixes mark operators fused into a whole-stage-codegen span
    assert "*(" in plan
    # both aggregate levels are inside codegen spans, not interpreted
    assert "*(2) HashAggregate" in plan or "*(1) HashAggregate" in plan
