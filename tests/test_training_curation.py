"""Curation-operator semantics: decontamination hit correctness,
repetition profile on a crafted doc, PII pattern counts, and the
sequence-packing invariants (budget, ordering, contiguity, truncation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.training import curation


def test_decontaminate_finds_planted_leak(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about astronomy and telescopes here"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "we ask whether the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    hits = curation.decontaminate(corpus, eval_set, ngram=5).collect()
    pairs = {(r["train_id"], r["eval_id"]): r["n_shared_grams"] for r in hits}
    # doc 1 shares the 9-token run -> five 5-grams; doc 2 shares nothing
    assert pairs == {(1, 100): 5}


def test_repetition_stats_on_crafted_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curation.repetition_stats(df, n=3).collect()}
    # doc 1: 4 grams, all identical
    assert rows[1]["n_grams"] == 4 and rows[1]["n_distinct_grams"] == 1
    assert rows[1]["top_gram_count"] == 4 and rows[1]["repetition_ratio"] == 0.75
    # doc 2: 4 grams, all distinct
    assert rows[2]["n_distinct_grams"] == 4 and rows[2]["repetition_ratio"] == 0.0


def test_pii_scan_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob@test.org today"),
            (2, "see https://example.com/x and call 5551234567"),
            (3, "clean text with no sensitive content at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curation.pii_scan(df).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["has_pii"]
    assert rows[2]["n_urls"] == 1 and rows[2]["n_long_digit_runs"] == 1
    assert rows[3]["has_pii"] is False


def test_pack_sequences_invariants(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    budget = 64
    out = curation.pack_sequences(docs, max_tokens=budget, n_shards=4).collect()
    assert len(out) == docs.count()  # every doc placed exactly once

    by_pack: dict = {}
    for r in out:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for (_, _), members in by_pack.items():
        members.sort(key=lambda r: r["pos_in_pack"])
        # budget: packed token mass never exceeds the budget unless the
        # pack is a single oversized (truncated) document
        total = sum(min(r["n_tokens"], budget) for r in members)
        if not any(r["truncated"] for r in members):
            assert total <= budget
        else:
            assert len(members) == 1
        # contiguity: offsets are the running sum of clamped lengths
        expected = 0
        for r in members:
            assert r["offset"] == expected
            expected += min(r["n_tokens"], budget)
        # ordering: doc ids ascend with position (shard-local id order)
        ids = [r["doc_id"] for r in members]
        assert ids == sorted(ids)


def test_pack_sequences_truncation_flag(spark):
    df = spark.createDataFrame(
        [(1, "w " * 10), (2, "w " * 500), (3, "w " * 10)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curation.pack_sequences(df, max_tokens=64, n_shards=1).collect()}
    assert rows[2]["truncated"] and not rows[1]["truncated"] and not rows[3]["truncated"]
    # the oversized doc sits alone in its pack
    assert rows[2]["pos_in_pack"] == 0
    assert rows[1]["pack_id"] != rows[2]["pack_id"] or rows[3]["pack_id"] != rows[2]["pack_id"]
