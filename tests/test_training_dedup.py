"""Dedup-operator guardrails: the n-gram doc-frequency cap and its
no-op-on-testdata contract, plus the degenerate-corpus bound it exists
for."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.training import dedup


def test_ngram_cap_is_noop_on_testdata(spark, sf_smoke):
    """No gram in the synthetic corpus reaches the default cap, so the
    capped output must equal the uncapped baseline exactly."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    inv = dedup.with_token_grams(docs).select(F.explode("grams").alias("gram"))
    max_df = inv.groupBy("gram").count().agg(F.max("count")).first()[0]
    assert max_df < 100, "fixture drifted: corpus now has a boilerplate gram"

    capped = dedup.ngram_jaccard_pairs(docs).orderBy("id_a", "id_b").collect()
    uncapped = (
        dedup.ngram_jaccard_pairs(docs, max_doc_freq=1 << 30)
        .orderBy("id_a", "id_b")
        .collect()
    )
    assert capped == uncapped
    assert len(capped) > 0


def test_ngram_cap_bounds_degenerate_gram(spark):
    """Docs sharing ONLY a boilerplate gram stop pairing once that gram
    exceeds the cap; docs sharing rare grams still pair."""
    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} unique{i} token{i} filler{i}") for i in range(8)]
    rows += [(100, "alpha beta gamma delta"), (101, "alpha beta gamma epsilon")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap below the boilerplate df (8 docs share its grams)
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=2, threshold=0.01, max_doc_freq=4
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in ids  # rare-gram pair survives
    assert all(a >= 100 for a, _ in ids)  # boilerplate-only pairs gone
