"""Semantics of the deterministic sampling operators, the as-of join, and
the sketch aggregates' error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.queries import registry
from tagmarshal_data_lakehouse_spark.training import sampling


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    from tagmarshal_data_lakehouse_spark.queries import load_views

    load_views(spark, sf_smoke)
    return spark.table("documents")


def test_split_is_total_and_stable(docs):
    out = sampling.train_val_test_split(docs)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    # id-stable: re-running yields the identical assignment
    again = sampling.train_val_test_split(docs)
    assert out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() == 0


def test_split_no_shuffle(docs):
    plan = sampling.train_val_test_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local projection only


def test_stratified_sample_nested(docs):
    low = sampling.stratified_sample(docs, {"en": 0.2, "de": 0.5})
    high = sampling.stratified_sample(docs, {"en": 0.6, "de": 0.9})
    low_ids = {r["doc_id"] for r in low.select("doc_id").collect()}
    high_ids = {r["doc_id"] for r in high.select("doc_id").collect()}
    assert low_ids <= high_ids  # raising rates strictly grows the sample
    # default rate 0 drops unlisted strata
    assert {r["lang"] for r in low.select("lang").distinct().collect()} <= {"en", "de"}


def test_hash_sample_exactly_k_and_nested(docs):
    s10 = sampling.hash_sample_k(docs, 10)
    s25 = sampling.hash_sample_k(docs, 25)
    assert s10.count() == 10 and s25.count() == 25
    ids10 = {r["doc_id"] for r in s10.collect()}
    ids25 = {r["doc_id"] for r in s25.collect()}
    assert ids10 <= ids25


def test_mixture_weights_honors_shares(docs):
    shares = {"en": 0.5, "de": 0.25, "fr": 0.25}
    rows = {r["lang"]: r for r in sampling.mixture_weights(docs, shares, "lang").collect()}
    assert set(rows) == set(shares)
    for lang, r in rows.items():
        assert 0 <= r["n_take"] <= r["n_available"]  # never upsamples
        assert 0.0 <= r["sample_rate"] <= 1.0
    # realized mixture matches targets within floor() rounding
    total = sum(r["n_take"] for r in rows.values())
    for lang, r in rows.items():
        assert abs(r["n_take"] - shares[lang] * total) <= len(shares)
    # the scarcest stratum is taken (nearly) whole: that's what bounds scale
    binding = min(rows.values(), key=lambda r: r["n_available"] / shares[r["lang"]])
    assert binding["n_take"] >= binding["n_available"] - 1


def test_asof_join_semantics(spark, sf_smoke):
    out = registry()["events_asof_join"].build(spark, sf_smoke)
    sample = out.filter(F.col("last_click_ts").isNotNull()).limit(50).collect()
    assert sample, "expected some purchases with a prior click"
    events = spark.table("events")
    clicks = {
        (r["user_id"], r["ts"]): r["value"]
        for r in events.filter("event_type = 'click'").collect()
    }
    for r in sample:
        # matched click is at-or-before the purchase...
        assert r["last_click_ts"] <= r["purchase_ts"]
        # ...and is the LATEST such click for that user
        later = [
            ts
            for (uid, ts) in clicks
            if uid == r["user_id"] and r["last_click_ts"] < ts <= r["purchase_ts"]
        ]
        assert not later


def test_asof_join_single_shuffle(spark, sf_smoke):
    plan = (
        registry()["events_asof_join"]
        .build(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # window carry: user_id exchanges only (dedup + carry share the key),
    # never a join operator
    assert "Join" not in plan


def test_approx_sketches_error_bounds(spark, sf_smoke):
    approx = {
        r["event_type"]: r
        for r in registry()["events_approx_sketches"].build(spark, sf_smoke).collect()
    }
    exact = {
        r["event_type"]: r
        for r in spark.sql(
            """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS n_users,
                   PERCENTILE(value, 0.5) AS p50
            FROM events GROUP BY event_type
            """
        ).collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        # HLL++ default rsd is 5%; allow 3x margin
        assert abs(a["approx_users"] - e["n_users"]) <= max(3, 0.15 * e["n_users"])
        assert a["p50_value"] == pytest.approx(e["p50"], rel=0.25)


def test_epoch_shuffle_is_exact_permutation(docs):
    n = docs.count()
    out = sampling.epoch_shuffle(docs, epoch=0)
    positions = sorted(r["epoch_position"] for r in out.collect())
    assert positions == list(range(n))  # dense, total, no gaps or dupes


def test_epoch_shuffle_epochs_differ_but_are_deterministic(docs):
    e0 = {r["doc_id"]: r["epoch_position"] for r in sampling.epoch_shuffle(docs, epoch=0).collect()}
    e0_again = {r["doc_id"]: r["epoch_position"] for r in sampling.epoch_shuffle(docs, epoch=0).collect()}
    e1 = {r["doc_id"]: r["epoch_position"] for r in sampling.epoch_shuffle(docs, epoch=1).collect()}
    assert e0 == e0_again  # reproducible within an epoch
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > len(e0) * 0.9  # epochs genuinely reshuffle


def test_epoch_shuffle_no_single_partition_window_on_data(docs):
    """The corpus-side window must partition by the hash-prefix bucket;
    the only single-partition stage allowed is the 256-row offsets
    aggregate (that frame is bounded by construction, not by data)."""
    plan = (
        sampling.epoch_shuffle(docs, epoch=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the big-side window runs per-bucket
    assert "partitionspec" not in plan.lower() or "_bucket" in plan
    import re
    windows = re.findall(r"Window \[.*?\]", plan)
    assert any("_bucket" in w for w in windows), windows


def test_weighted_sample_proportional_and_clamped(spark):
    """Ticket-lottery weighted sample: 8x-weighted rows dominate the
    sample roughly in ticket proportion; weights are clamped to
    [1, max_weight]; nested property holds (keys are k-independent)."""
    rows = [(i, 8) for i in range(200)] + [(i, 1) for i in range(200, 400)]
    rows += [(1000, 0), (1001, 10_000)]  # clamp low / clamp high
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = sampling.weighted_sample_k(df, k=100, weight_col="w", max_weight=64)
    got = out.collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["doc_id"] < 200)
    # tickets: 200*8 + 200*1 + 1 + 64 -> heavy share ~88%; loose bound
    assert heavy > 60
    by_id = {r["doc_id"]: r["sample_weight"] for r in out.select("doc_id", "sample_weight").collect()}
    all_w = {
        r["doc_id"]: r["sample_weight"]
        for r in sampling.weighted_sample_k(df, k=500, weight_col="w", max_weight=64).collect()
    }
    assert all_w[1000] == 1 and all_w[1001] == 64  # clamped
    # nested: smaller sample is a prefix of the larger
    assert set(by_id) <= set(all_w)


def test_source_drift_zero_for_identical_and_two_for_disjoint(spark):
    """L1 drift is 0 when a source matches the corpus profile it alone
    defines... use two sources: identical histograms -> both drift 0;
    disjoint length buckets -> drift approaches 2."""
    from tagmarshal_data_lakehouse_spark.training.text import source_drift

    short = "one two three"                      # bucket 0
    long = " ".join(["w"] * 25)                  # bucket 20
    # identical profile: each source has 2 short + 2 long
    rows = [(i, "a", short) for i in range(2)] + [(10 + i, "a", long) for i in range(2)]
    rows += [(20 + i, "b", short) for i in range(2)] + [(30 + i, "b", long) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    drift = {r["source"]: r["drift_l1"] for r in source_drift(df).collect()}
    assert drift == {"a": 0.0, "b": 0.0}

    # disjoint: source a all short, source b all long
    rows2 = [(i, "a", short) for i in range(4)] + [(10 + i, "b", long) for i in range(4)]
    df2 = spark.createDataFrame(rows2, "doc_id long, source string, text string")
    d2 = {r["source"]: r["drift_l1"] for r in source_drift(df2).collect()}
    # each source: |1 - 0.5| + |0 - 0.5| = 1.0 vs the 50/50 corpus
    assert d2 == {"a": 1.0, "b": 1.0}


def test_temperature_mixture_flattens_toward_uniform(docs):
    """alpha=0.5 shares sit strictly between natural (n/N) and uniform
    (1/S) for every stratum whose size differs from the mean; takes
    realize the budget within floor() rounding."""
    out = {r["lang"]: r for r in sampling.temperature_mixture(docs, budget=60, strata_col="lang").collect()}
    counts = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    total_n, n_strata = sum(counts.values()), len(counts)
    assert set(out) == set(counts)
    assert abs(sum(r["temp_share"] for r in out.values()) - 1.0) < 1e-5
    budget_taken = sum(r["n_take"] for r in out.values())
    assert 60 - n_strata <= budget_taken <= 60
    for lang, r in out.items():
        natural, uniform = counts[lang] / total_n, 1.0 / n_strata
        lo, hi = sorted((natural, uniform))
        if abs(natural - uniform) > 1e-9:
            assert lo < r["temp_share"] < hi, (lang, r["temp_share"], natural, uniform)
        assert 0.0 <= r["sample_rate"] <= 1.0


def test_length_matched_sample_matches_target_histogram(spark, sf_smoke):
    """The selected candidate set must carry the target's length-bucket
    quota exactly wherever candidates suffice, never exceed a bucket's
    quota, and be deterministic across partitionings."""
    from pyspark.sql import functions as F

    from tagmarshal_data_lakehouse_spark.training import sampling, text

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    tgt_sources = ("src0", "src1", "src2", "src3")
    target = docs.filter(F.col("source").isin(*tgt_sources))
    cands = docs.filter(~F.col("source").isin(*tgt_sources))
    total = 60

    out = sampling.length_matched_sample(cands, target, total=total)
    got = {r["length_bucket"]: r["n"] for r in out.groupBy("length_bucket").agg(F.count(F.lit(1)).alias("n")).collect()}

    def bucket_counts(df):
        n = text.token_count(F.col("text"))
        b = F.least(F.floor(n / 10).cast("int"), F.lit(9))
        return {r["b"]: r["n"] for r in df.select(b.alias("b")).groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()}

    tgt_b = bucket_counts(target)
    cand_b = bucket_counts(cands)
    n_target = sum(tgt_b.values())
    for b, n_b in tgt_b.items():
        quota = (total * n_b) // n_target
        expect = min(quota, cand_b.get(b, 0))
        assert got.get(b, 0) == expect, (b, got.get(b), quota, cand_b.get(b))
    assert sum(got.values()) <= total

    # deterministic under repartitioning
    out2 = sampling.length_matched_sample(cands.repartition(13), target, total=total)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(r["doc_id"] for r in out2.collect())
