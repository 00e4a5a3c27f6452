"""Skew-operator semantics: salted join and two-phase distinct must be
row-identical to their naive forms on a deliberately skewed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.operators import salted_join, two_phase_distinct


def _skewed(spark):
    # 90% of fact rows share key 1; dim has 4 keys
    fact = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 4).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, name string")
    return fact, dim


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, "k").select("row_id", "k", "v", "name")
    salted = salted_join(fact, dim, on="k", salt_col="row_id", salt_factor=8).select(
        "row_id", "k", "v", "name"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_keeps_unmatched(spark):
    fact, dim = _skewed(spark)
    dim_partial = dim.filter("k <> 1")  # drop the hot key from the dim
    plain = fact.join(dim_partial, "k", "left").select("row_id", "name")
    salted = salted_join(fact, dim_partial, on="k", salt_col="row_id", salt_factor=4, how="left").select(
        "row_id", "name"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_two_phase_distinct_matches_count_distinct(spark):
    fact, _ = _skewed(spark)
    naive = {
        r["k"]: r["n"]
        for r in fact.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    two = {
        r["k"]: r["n_distinct"]
        for r in two_phase_distinct(fact, ["k"], "v").collect()
    }
    assert naive == two


def test_bloom_semi_join_superset_and_shuffle_free(spark):
    """Semi form keeps every true match (no false negatives) with few
    false positives; anti form drops every true match. The big side's
    plan must contain no join and no exchange — the whole point."""
    from tagmarshal_data_lakehouse_spark.operators import bloom_semi_join

    big = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    keys = spark.createDataFrame([(i * 13,) for i in range(50)], "k long")
    true_keys = {i * 13 for i in range(50) if i * 13 < 5000}

    semi = bloom_semi_join(big, keys, on="k")
    got = {r["k"] for r in semi.collect()}
    assert true_keys <= got                      # zero false negatives
    assert len(got - true_keys) <= 50            # FPR tiny at 2^20 bits

    anti = bloom_semi_join(big, keys, on="k", anti=True)
    anti_got = {r["k"] for r in anti.collect()}
    assert not (true_keys & anti_got)            # every true match dropped
    assert len(anti_got) >= 5000 - len(true_keys) - 50

    plan = semi._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
