"""Registry-order contract.

The driver's correctness sweep walks ``registry()`` in insertion order
under a budget (rounds 2 and 3 each stopped at exactly 50 entries), so
ordering is a coverage guarantee. With 157 entries and a 50-slot budget,
full driver coverage is a ROTATION; this module pins the invariants the
rotation must keep every round:

- the flagship stripes give every family a row even under a tiny budget;
- every red / edited-since-green / newly-oracled / never-swept query is
  inside the budget window (the round's _SWEEP_PRIORITY head);
- no oracle-backed query goes more than one round without a driver row
  (what's outside this round's window was green last round).
"""

from __future__ import annotations

from tagmarshal_data_lakehouse_spark.queries import (
    _FLAGSHIP_INTERLEAVE,
    _SWEEP_PRIORITY,
    registry,
)

SWEEP_BUDGET = 50

# Round-3 sweep = flagship + all events + all training (CORRECTNESS_r03
# keys). Anything green there may sit past the budget for one round.
_GREEN_LAST_ROUND = frozenset(
    {
        "events_sessionize", "events_tumbling_window", "events_asof_join",
        "events_funnel", "events_dedup_exact", "events_approx_sketches",
        "events_time_rollup", "events_retention_cohorts",
        "events_anomaly_zscore", "events_hll_rollup", "events_approx_topk",
        "doc_dedup_exact", "doc_token_stats", "emb_cosine_topk",
        "doc_quality", "doc_lang_id", "doc_ngram_jaccard",
        "doc_minhash_near_dups", "doc_simhash_near_dups", "emb_label_stats",
        "emb_cosine_topk_lsh", "emb_cosine_near_dups",
        "emb_cosine_near_dups_lsh", "emb_ivf_topk", "emb_pq_topk",
        "emb_kmeans", "doc_train_split", "doc_stratified_sample",
        "doc_hash_sample_k", "doc_mixture_weights", "doc_decontaminate",
        "doc_repetition", "doc_pii_scan", "doc_dup_rate_by_source",
        "doc_token_histogram", "doc_bigram_freqs", "doc_clean_corpus_stats",
        "multimodal_features", "multimodal_frame_sample", "doc_span_dedup",
        "doc_cross_source_dups",
        "tpch_q3", "tpch_q6", "tpch_q18",
        "agg_pricing_summary", "window_dedup", "join_multiway",
        # rows-only in r03 but swept; the two that since gained oracles
        # (doc_dedup_clusters, doc_pack_sequences) are deliberately NOT
        # listed: their first hash row must come this round.
    }
)


def _family(name: str) -> str:
    if name.startswith("events_"):
        return "events"
    if name.startswith(("doc_", "emb_", "multimodal_")):
        return "training"
    if name.startswith("tpch_"):
        return "tpch"
    return "relational"


def test_first_twelve_interleave_every_family():
    names = list(registry())
    # Every 4-slot stripe of the flagship block holds one query per family,
    # so even a sweep budget of 4 yields a row for each family.
    for stripe_start in (0, 4, 8):
        stripe = names[stripe_start : stripe_start + 4]
        assert {_family(n) for n in stripe} == {
            "events",
            "training",
            "tpch",
            "relational",
        }, stripe


def test_head_is_flagship_then_priority_and_fills_budget():
    names = list(registry())
    head = tuple(names[:SWEEP_BUDGET])
    assert head == _FLAGSHIP_INTERLEAVE + _SWEEP_PRIORITY
    assert len(head) == SWEEP_BUDGET


def test_priority_block_carries_the_must_verify_entries():
    head = set(list(registry())[:SWEEP_BUDGET])
    # Round-3 red row (fixed) + text edited after its green row.
    assert "emb_quantize_int8" in head
    assert "scalar_datetime" in head
    # Newly-oracled: first hash row must come this round.
    assert "doc_dedup_clusters" in head
    assert "doc_pack_sequences" in head
    # The 12 extended TPC-H queries that had never been swept.
    never_swept = {
        "tpch_q4", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10",
        "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q17", "tpch_q19", "tpch_q22",
        # round-4 shape adaptations completing the 22-query suite
        "tpch_q2", "tpch_q11", "tpch_q12", "tpch_q16", "tpch_q20", "tpch_q21",
    }
    assert never_swept <= head
    # New round-4 operators: first driver rows must come this round.
    new_ops = {
        "doc_incremental_dedup", "emb_semantic_dedup", "multimodal_resize",
        "doc_decontaminate_bloom", "doc_chunk_windows", "doc_epoch_shuffle",
        "doc_curation_pipeline", "emb_ivfpq_topk",
    }
    assert new_ops <= head


# Added after the round-4 head filled its 50 slots (every head entry is
# itself a first-row must-verify): pytest-oracle-green at sf0.001 AND
# sim-verified at sf0.01; their first driver row leads round 5's window.
_NEW_DEFERRED_TO_NEXT_ROUND = frozenset(
    {
        "telemetry_missing_ts_by_ingest",
        "telemetry_missing_ts_by_location",
        "telemetry_missing_ts_trend",
        "doc_bpe_merges",  # rows-only; python-reference-pinned in pytest
        "doc_token_rarity",  # oracle-green at sf0.001 + sf0.01 (sim)
        "doc_dedup_eval",  # rows-only; confusion-count pytest pins
        "doc_tf_cosine_pairs",  # oracle-green at sf0.001 + sf0.01 (sim)
        "doc_weighted_sample",  # oracle-green at sf0.001 + sf0.01 (sim)
        "doc_source_drift",  # oracle-green at sf0.001 + sf0.01 (sim)
        "doc_pii_redact",  # oracle-green at sf0.001 + sf0.01 (sim)
        "doc_corpus_keywords",  # oracle-green at sf0.001 + sf0.01 (sim)
        "emb_label_centroids",  # oracle-green at sf0.001 + sf0.01 (sim)
        "events_gapfill",  # oracle-green at sf0.001 + sf0.01 (sim)
        "emb_hard_negatives",  # oracle-green at sf0.001 + sf0.01 (sim)
        "emb_hard_negatives_lsh",  # rows-only; subset-of-exact pytest pin
        "doc_semantic_domain_profile",  # oracle-green at sf0.001 + sf0.01 (sim)
        "doc_temperature_mixture",  # oracle-green at sf0.001 + sf0.01 (sim)
        "events_activity_islands",  # oracle-green at sf0.001 + sf0.01 (sim)
        "events_interval_join",  # oracle-green at sf0.001 + sf0.01 (sim)
        "events_value_histogram",  # oracle-green at sf0.001 + sf0.01 (sim)
        "emb_cosine_topk_gemm",  # oracle-green at sf0.001 + sf0.01 (sim)
        "emb_hard_negatives_gemm",  # oracle-green at sf0.001 + sf0.01 (sim)
        "events_point_in_interval",  # oracle-green at sf0.001 + sf0.01 (sim)
        "emb_cosine_near_dups_gemm",  # rows-only; pair-identical-to-lsh pytest pin
        "doc_bpe_encode",  # rows-only; python-reference-pinned encoder
        "doc_length_matched_sample",  # oracle-green at sf0.001 + sf0.01 (sim)
        "scalar_variant",  # oracle-green at sf0.001 + sf0.01 (sim)
    }
)


def test_nothing_goes_two_rounds_without_a_driver_row():
    names = list(registry())
    beyond = names[SWEEP_BUDGET:]
    stale = [
        n
        for n in beyond
        if n not in _GREEN_LAST_ROUND and n not in _NEW_DEFERRED_TO_NEXT_ROUND
    ]
    # Everything outside this round's window was green last round, except
    # the explicitly deferred slice-2 of the relational rotation (their
    # last green is round 2; they MUST lead the tail so round 5's window
    # picks them up first).
    assert all(_family(n) == "relational" for n in stale), stale
    assert beyond[: len(stale)] == stale, "stale relational slice must lead the tail"


def test_registry_complete_and_unique():
    names = list(registry())
    assert len(names) == len(set(names))
    assert len(names) >= 104
