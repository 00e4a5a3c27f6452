"""Physical-plan contracts: the optimizations the 100 TB design depends
on must be visible in the executed plan, not assumed.

Each test pins one property via the `plans` introspection module: filter
and column pushdown into the parquet scan, broadcast (not shuffle) joins
for dims, map-side partial aggregation, shuffle-free row-local operators,
and whole-stage codegen coverage of the hot expressions.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import plans
from tagmarshal_data_lakehouse_spark.queries import load_views, registry


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    load_views(spark, sf_smoke)
    df = spark.table("lineitem").filter(F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag", "l_quantity"
    )
    pushed = plans.pushed_filters(df)
    assert "IsNotNull(l_shipdate)" in pushed
    assert any(p.startswith("LessThanOrEqual(l_shipdate") for p in pushed)


def test_column_pruning_reaches_scan(spark, sf_smoke):
    load_views(spark, sf_smoke)
    df = spark.table("lineitem").select("l_returnflag", "l_quantity")
    schema = plans.read_schema(df)
    assert "l_returnflag" in schema and "l_extendedprice" not in schema


def test_dim_joins_broadcast_not_shuffle(spark, sf_smoke, reg):
    strategies = plans.join_strategies(reg["join_broadcast"].build(spark, sf_smoke))
    assert strategies == ["BroadcastHashJoin"]


def test_range_join_is_broadcast_nested_loop(spark, sf_smoke, reg):
    strategies = plans.join_strategies(reg["join_range_broadcast"].build(spark, sf_smoke))
    assert strategies == ["BroadcastNestedLoopJoin"]


def test_pricing_summary_partial_aggregation(spark, sf_smoke, reg):
    # map-side combine: HashAggregate appears below AND above one exchange
    df = reg["agg_pricing_summary"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert plans.count_exchanges(df) == 1


def test_sampling_ops_are_shuffle_free(spark, sf_smoke, reg):
    for name in ("doc_train_split", "doc_pii_scan"):
        df = reg[name].build(spark, sf_smoke)
        assert plans.count_exchanges(df) == 0, f"{name} must stay row-local"


def test_hash_sample_is_take_ordered(spark, sf_smoke, reg):
    plan = plans.physical_plan(reg["doc_hash_sample_k"].build(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_asof_join_has_no_join_operator(spark, sf_smoke, reg):
    df = reg["events_asof_join"].build(spark, sf_smoke)
    assert plans.join_strategies(df) == []  # union-and-carry window, not a join


def test_decontaminate_broadcasts_eval_side(spark, sf_smoke, reg):
    df = reg["doc_decontaminate"].build(spark, sf_smoke)
    assert "BroadcastHashJoin" in plans.join_strategies(df)


def test_salted_join_spreads_keys_and_stays_hash(spark, sf_smoke, reg):
    df = reg["join_salted_skew"].build(spark, sf_smoke)
    # the salted key pair still hash-joins; no nested loop, no cartesian
    assert set(plans.join_strategies(df)) <= {"BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"}


def test_hot_scans_are_codegen(spark, sf_smoke, reg):
    # codegen spans only appear in the FINAL adaptive plan, and only the
    # DataFrame's own execution finalizes it (count() plans separately)
    df = reg["agg_pricing_summary"].build(spark, sf_smoke)
    df.collect()
    assert plans.codegen_fused(df)


def test_bucketed_join_is_shuffle_free(spark, sf_smoke):
    """Co-bucketed fact-fact join: SortMergeJoin with ZERO Exchange on
    either side — the write-once-shuffle-never-again contract that makes
    recurring 100 TB joins affordable."""
    from tagmarshal_data_lakehouse_spark import operators

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        operators.write_bucketed(li, "bkt_lineitem", ["l_orderkey"], n_buckets=8)
        operators.write_bucketed(od, "bkt_orders", ["o_orderkey"], n_buckets=8)
        # disable broadcast so the bucket spec (not a tiny-side broadcast)
        # is what eliminates the shuffle — at 100 TB neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = operators.bucketed_join(
            spark,
            "bkt_lineitem",
            "bkt_orders",
            F.expr("l_orderkey = o_orderkey"),
        )
        assert plans.join_strategies(joined) == ["SortMergeJoin"]
        assert plans.count_exchanges(joined) == 0
        # semantics: identical row count to the plain (shuffling) join
        plain = li.join(od, F.expr("l_orderkey = o_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_partitioned_fact_join_uses_dynamic_partition_pruning(spark, sf_smoke, tmp_path):
    """A selective dim filter must prune FACT PARTITIONS at runtime
    (DPP): the fact scan's PartitionFilters carry a dynamicpruning
    subquery fed by the broadcast dim, so a 100 TB fact partitioned on
    the join key reads only the partitions the dim filter selects —
    static pushdown alone cannot do this (the qualifying keys are only
    known after the dim filter runs)."""
    from tagmarshal_data_lakehouse_spark.storage import Lakehouse

    lake = Lakehouse(spark, str(tmp_path / "wh"))
    fact = spark.range(0, 2000).select(
        (F.col("id") % 20).alias("course_id"), F.col("id").alias("v")
    )
    lake.write_partitioned("fact", fact, ["course_id"])
    dim = spark.createDataFrame(
        [(i, "links" if i < 3 else "parkland") for i in range(20)],
        "course_id long, course_type string",
    )
    j = (
        lake.read("fact")
        .join(dim.filter(F.col("course_type") == "links"), "course_id")
        .groupBy("course_id")
        .agg(F.sum("v").alias("v_sum"))
    )
    plan = plans.physical_plan(j)
    assert "dynamicpruning" in plan.lower(), plan


def test_time_rollup_is_single_scan_expand(spark, sf_smoke, reg):
    # GROUPING SETS must expand inside one aggregation pipeline — the
    # fact is scanned once for every resolution, not once per resolution
    df = reg["events_time_rollup"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_bigram_pair_generation_is_join_free(spark, sf_smoke, reg):
    # adjacent pairs come from a row-local transform-over-sequence, so
    # the only join-like op allowed is none; top-k must be
    # TakeOrderedAndProject (never a global sort)
    df = reg["doc_bigram_freqs"].build(spark, sf_smoke)
    assert plans.join_strategies(df) == []
    assert "TakeOrderedAndProject" in plans.physical_plan(df)


def test_corr_regression_partial_aggregation(spark, sf_smoke, reg):
    # moment sums combine map-side: one exchange, partial+final aggregate
    df = reg["agg_corr_regression"].build(spark, sf_smoke)
    assert plans.count_exchanges(df) == 1
    assert plans.physical_plan(df).count("HashAggregate") >= 2


def test_range_frame_single_shuffle(spark, sf_smoke, reg):
    # the RANGE window shuffles once on the partition key; no second
    # exchange may appear
    df = reg["window_range_frame"].build(spark, sf_smoke)
    assert plans.count_exchanges(df) == 1


def test_full_outer_aggregates_before_join(spark, sf_smoke, reg):
    # both sides shrink to |keys| rows BEFORE the full outer join: the
    # plan must show aggregation below the join, and the join must be a
    # hash/sort-merge equi-join (never nested-loop)
    df = reg["join_full_outer"].build(spark, sf_smoke)
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)


def test_tpch_dim_joins_all_broadcast(spark, sf_smoke, reg):
    # Q5 (6-way) and Q8 (8-way): every dim-side join must broadcast at
    # this SF, and the only exchange is the final aggregation shuffle.
    # At 100 TB the lineitem-orders edge exceeds the broadcast threshold
    # and AQE falls back to sort-merge — the contract here is that no
    # join *shuffles* when a broadcast is available.
    for name in ("tpch_q5", "tpch_q8"):
        df = reg[name].build(spark, sf_smoke)
        strategies = plans.join_strategies(df)
        assert strategies and all(s == "BroadcastHashJoin" for s in strategies), (
            name,
            strategies,
        )
        assert plans.count_exchanges(df) == 1, name


def test_minhash_lsh_never_goes_quadratic(spark, sf_smoke, reg):
    """The 100 TB claim of the LSH dedup path, pinned in the plan: pair
    generation is bucket-local (no CartesianProduct, no
    BroadcastNestedLoopJoin anywhere), the verify join is hash-based,
    and the shuffle inventory is bounded by the documented set
    (parallelize-spread, band bucket, candidate distinct, verify join
    sides) — not O(n) or data-dependent."""
    df = reg["doc_minhash_near_dups"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)
    assert plans.count_exchanges(df) <= 6


def test_embedding_lsh_never_goes_quadratic(spark, sf_smoke, reg):
    """Same contract for the embedding near-dup scale path."""
    df = reg["emb_cosine_near_dups_lsh"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plans.count_exchanges(df) <= 6


def test_hard_negatives_lsh_broadcasts_queries(spark, sf_smoke, reg):
    """Hard-negative mining's scale path: the bounded query side is
    BROADCAST to the candidate scan (bucket-equi join) — the candidate
    side never shuffles and no cross product is formed."""
    df = reg["emb_hard_negatives_lsh"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_exact_dedup_single_shuffle(spark, sf_smoke, reg):
    """Exact dedup is one hash-shuffle on the content digest (plus the
    small-input spread repartition) — nothing else may move data."""
    df = reg["doc_dedup_exact"].build(spark, sf_smoke)
    assert plans.join_strategies(df) == []
    assert plans.count_exchanges(df) <= 2


def test_minhash_signatures_shuffle_free(spark, sf_smoke):
    """Signature computation itself must be entirely row-local: the only
    permitted exchange is the ensure_parallelism spread of a small input."""
    from tagmarshal_data_lakehouse_spark.training import dedup as tdedup

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    sigs = tdedup.minhash_signatures(docs)
    assert plans.join_strategies(sigs) == []
    assert plans.count_exchanges(sigs) <= 1


def test_minhash_verdict_never_pair_grain(spark, sf_smoke, reg):
    """The verdict-only dedup path's 100 TB contract: no pair-grain
    frame exists anywhere in the plan. Banding shuffles once on the
    bucket key and the representative election is a window MIN over
    that same partitioning; the verify join fans each doc out to at
    most `bands` bucket representatives (O(N·bands) rows), so — unlike
    the pair path, whose OUTPUT grows as replica² (SCALE.md 64x probe)
    — no operator here can go quadratic: no CartesianProduct, no
    nested loop, and a fixed exchange inventory (parallelism spread,
    band bucket window, candidate distinct, verify join + final
    verdict aggregation/join sides)."""
    df = reg["doc_minhash_dedup_verdict"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)
    assert plans.scale_lint(df) == []
    # <= 9 since the r13 optimization pass: the parallelism spread became
    # a DETERMINISTIC hash repartition (ensure_parallelism — reusable by
    # AQE, retry-safe), which count_exchanges now sees as
    # "Exchange hashpartitioning" where the old round-robin spread was
    # invisible to it.  The executed shuffle inventory is unchanged (the
    # spread exchange always existed); the tree repeats the now-shared
    # spread subtree per consumer, so the STRING count rose 7 -> 9
    # without any new data movement.
    assert plans.count_exchanges(df) <= 9


def test_span_dedup_row_local_generation(spark, sf_smoke, reg):
    """Span generation must stay inside the scan projection (one explode
    of per-doc span arrays, never a token-grain shuffle); the only wide
    ops are the span-frequency aggregate and the joins back."""
    df = reg["doc_span_dedup"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)


def test_tf_cosine_inverted_index_never_goes_quadratic(spark, sf_smoke, reg):
    """TF-cosine pair generation is an inverted-index hash join on the
    term (never a doc×doc nested loop), the over-cap term drop is a
    broadcast anti-join on the big posting side, and term-frequency
    computation is row-local (no (doc, term) pre-aggregation exchange
    before the term join)."""
    df = reg["doc_tf_cosine_pairs"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    strategies = plans.join_strategies(df)
    # every nested loop in this plan must be a one-row broadcast (the
    # audit-scalar and in-plan corpus-count idioms) — scale_lint knows
    # how to tell those from a data-bearing nested loop
    assert plans.scale_lint(df) == []
    assert sum(s == "BroadcastHashJoin" for s in strategies) >= 1, strategies


def test_cross_source_dups_hash_join_on_digest(spark, sf_smoke, reg):
    """The contamination matrix self-join is digest-equality keyed — a
    hash-based join, never a nested loop over the corpus."""
    df = reg["doc_cross_source_dups"].build(spark, sf_smoke)
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)
    assert "CartesianProduct" not in plans.physical_plan(df)


def test_tpch_subqueries_decorrelate_to_joins(spark, sf_smoke, reg):
    # Q4's correlated EXISTS and Q17's correlated scalar AVG must be
    # decorrelated by Catalyst into aggregate+join shapes — a
    # per-row subquery re-execution would be quadratic at scale. The
    # physical plan therefore may not contain any nested-loop join or
    # uncorrelated-loop artifact; all joins must be hash-based.
    # q2: correlated MIN; q20: correlated scalar in HAVING inside IN;
    # q21: EXISTS + NOT EXISTS over the shared lateness CTE.
    for name in ("tpch_q2", "tpch_q4", "tpch_q17", "tpch_q20", "tpch_q21", "tpch_q22"):
        df = reg[name].build(spark, sf_smoke)
        strategies = plans.join_strategies(df)
        assert strategies and all("NestedLoop" not in s for s in strategies), (
            name,
            strategies,
        )


def test_incremental_dedup_digest_keyed_no_cartesian(spark, sf_smoke, reg):
    """Delta-vs-corpus dedup: the corpus reduces to distinct digests
    before a hash-keyed verdict join; the within-batch window and the
    join share the content_md5 key. No nested loop anywhere, exchange
    inventory bounded (corpus distinct, batch window, join sides)."""
    df = reg["doc_incremental_dedup"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)
    assert plans.count_exchanges(df) <= 4


def test_semantic_dedup_cluster_keyed_no_cartesian(spark, sf_smoke):
    """SemDeDup: the within-cluster rescoring join must be keyed on the
    cluster id (hash join) — the n^2 cross product may never appear even
    though the per-cluster cost is quadratic by design."""
    from tagmarshal_data_lakehouse_spark.training import similarity

    embs = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    df = similarity.semantic_dedup(embs, n_clusters=4, threshold=0.9, kmeans_iter=1)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)


def test_semantic_dedup_multiprobe_assignment_is_row_local(spark, sf_smoke):
    """Multi-probe (n_probes=2) keeps the scale shape: the probe
    assignment is a row-local projection (distance array -> sort ->
    slice -> posexplode — NO shuffle, NO Python UDF in assignment), the
    scoring join stays cluster-keyed, and no cartesian appears. The
    probe expansion may add at most the same exchange count as the
    single-probe plan plus the one extra scoring-side exchange."""
    from tagmarshal_data_lakehouse_spark.training import clustering, similarity

    embs = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    # assignment primitive alone: zero exchanges, zero Python eval on
    # the expression branch (the default at this corpus size)
    probe = clustering.assign_clusters_multiprobe(
        embs, [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62], 2
    )
    probe_plan = plans.physical_plan(probe)
    assert plans.count_exchanges(probe) == 0
    assert "InPandas" not in probe_plan and "BatchEvalPython" not in probe_plan
    assert "ArrowEvalPython" not in probe_plan

    # r14 GEMM twin branch: still row-local (zero exchanges) and its
    # only Python node is ONE ArrowEvalPython (the confident-probe
    # pandas UDF) — never a row-at-a-time BatchEvalPython or a
    # full-frame mapInPandas barrier
    probe_g = clustering.assign_clusters_multiprobe(
        embs, [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62], 2, use_gemm=True
    )
    probe_g_plan = plans.physical_plan(probe_g)
    assert plans.count_exchanges(probe_g) == 0
    assert "InPandas" not in probe_g_plan and "BatchEvalPython" not in probe_g_plan
    assert probe_g_plan.count("ArrowEvalPython") == 1

    df = similarity.semantic_dedup(
        embs, n_clusters=4, threshold=0.9, kmeans_iter=1, n_probes=2
    )
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)


def test_stream_corpus_dedup_is_anti_join(spark, sf_smoke):
    """The streaming corpus dedup must plan as a left-anti hash join on
    the digest (state-free stream-static shape) — checked on the batch
    twin of the same plan (streaming planning differs only in the
    micro-batch wrapper)."""
    from tagmarshal_data_lakehouse_spark.streaming import stream_dedup_against_corpus

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = stream_dedup_against_corpus(docs, docs)
    plan = plans.physical_plan(out)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_windows_row_local_generation(spark, sf_smoke, reg):
    """Chunking is a scan-side generator: tokenize -> sequence ->
    explode -> slice, all inside the projection. No join anywhere, and
    the only exchange allowed is ensure_parallelism's one-time spread of
    a small input — the 1->N expansion itself must not move data."""
    df = reg["doc_chunk_windows"].build(spark, sf_smoke)
    assert plans.join_strategies(df) == []
    assert plans.count_exchanges(df) <= 1
    assert "Generate" in plans.physical_plan(df)  # explode, not a join


def test_epoch_shuffle_two_bounded_shuffles(spark, sf_smoke, reg):
    """The permutation must be assembled from the 256-bucket
    decomposition: the corpus-side window partitions by _bucket (256-way
    parallel), the offsets frame is broadcast back, and the exchange
    count stays fixed (bucket agg + bucket window + broadcast) at any
    corpus size."""
    df = reg["doc_epoch_shuffle"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    strategies = plans.join_strategies(df)
    assert strategies and all("Broadcast" in s for s in strategies)
    assert plans.count_exchanges(df) <= 4


def test_curation_pipeline_single_exchange(spark, sf_smoke, reg):
    """The composed curate_corpus plan must cost what its most expensive
    stage costs: quality/lang/split are expression-stacked on the scan
    and the dedup verdict rides the one content-digest window shuffle —
    no join-back by id, no second wide stage (plus at most the
    ensure_parallelism spread of a small input)."""
    df = reg["doc_curation_pipeline"].build(spark, sf_smoke)
    assert plans.join_strategies(df) == []
    assert plans.count_exchanges(df) <= 2  # spread + digest window


def test_exact_dedup_prunes_text_below_window(spark, sf_smoke, reg):
    """exact_duplicates routes through with_dedup_verdict, which keeps
    all input columns; Catalyst must still prune the text column out of
    the digest shuffle (it is only consumed by the pre-shuffle digest
    projection)."""
    df = reg["doc_dedup_exact"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    import re
    exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)[^\n]*", plan)
    assert exchanges and all("text" not in e for e in exchanges)


# -- scale_lint: the automated would-this-survive-100x plan audit --------


def test_scale_lint_flags_synthetic_hazards(spark):
    from pyspark.sql.window import Window

    a = spark.range(1000).select(F.col("id").alias("x"), (F.col("id") % 7).alias("g"))
    b = spark.range(1000).select(F.col("id").alias("y"))
    # raw-input global window: one task swallows the corpus
    rn = a.withColumn("rn", F.row_number().over(Window.orderBy("x")))
    assert [f["rule"] for f in plans.scale_lint(rn)] == ["single_partition_window"]
    # non-equi join lowers to a nested loop
    assert "nested_loop_join" in {f["rule"] for f in plans.scale_lint(a.join(b, a.x < b.y))}
    # row-at-a-time Python UDF
    ud = F.udf(lambda v: v + 1, "long")
    assert "python_row_udf" in {f["rule"] for f in plans.scale_lint(a.select(ud("x")))}


def test_scale_lint_exempts_bounded_idioms(spark):
    from pyspark.sql.window import Window

    a = spark.range(1000).select(F.col("id").alias("x"), (F.col("id") % 7).alias("g"))
    # window over an aggregate: frame is bounded by group cardinality
    agg = a.groupBy("g").agg(F.sum("x").alias("s"))
    assert plans.scale_lint(agg.withColumn("rt", F.sum("s").over(Window.orderBy("g")))) == []
    # partitioned window: parallel
    assert (
        plans.scale_lint(a.withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("x"))))
        == []
    )
    # the one-row audit-scalar broadcast cross join (ngram/tf_cosine idiom)
    audit = a.agg(F.count(F.lit(1)).alias("n"))
    assert plans.scale_lint(a.crossJoin(F.broadcast(audit))) == []
    # global ORDER BY ... LIMIT lowers to TakeOrderedAndProject
    assert plans.scale_lint(a.orderBy("x").limit(5)) == []


# Queries whose lint findings are DESIGN, not defect — each pinned by its
# own plan-contract test above: the broadcast range join IS a BNLJ by
# contract; the exact cosine baseline is the guarded quadratic sibling
# of three ANN paths; PQ's ADC build broadcasts codebook tables.
_LINT_ALLOWLIST = {
    "join_range_broadcast": {"nested_loop_join"},
    # Per-round drill-down (reference dashboard/utils/queries.py
    # get_round_progression): the library text orders ONE round's events
    # with unpartitioned LAG/ROW_NUMBER — the frame is pre-filtered to a
    # single round_id, so the single partition holds one round's fixes
    # (thousands, not the table), the reference's own detail-view shape.
    "telemetry_round_progression": {"single_partition_window"},
    "emb_cosine_near_dups": {"nested_loop_join"},
    "emb_cosine_topk": {"nested_loop_join"},
    "emb_pq_topk": {"nested_loop_join"},
    "emb_ivfpq_topk": {"nested_loop_join"},
    # composes the topk plans above, so it inherits their documented
    # bounded broadcast-query-set BNLJ — nothing new in the union of
    # one-row recall aggregates itself
    "emb_ann_recall": {"nested_loop_join"},
    # the in-plan 2x window expansion is a BROADCAST nested loop over a
    # 2-row constant relation (size/hop = 2 offsets) — bounded by
    # construction; test_hopping_window_expands_in_plan pins that every
    # join strategy in this plan is a broadcast
    "events_hopping_window": {"nested_loop_join"},
}


def test_registry_is_scale_lint_clean(spark, sf_smoke, reg):
    """Every registry query's plan passes the automated scale audit,
    modulo the documented intentional designs — a standing gate so a
    future query with a cartesian, a raw-input global window, or a row
    UDF cannot land silently."""
    problems = {}
    for name, q in reg.items():
        try:
            findings = plans.scale_lint(q.build(spark, sf_smoke))
        except Exception as exc:  # noqa: BLE001 — surface as a failure row
            problems[name] = [f"build-error: {exc}"[:120]]
            continue
        rules = {f["rule"] for f in findings}
        unexpected = rules - _LINT_ALLOWLIST.get(name, set())
        if unexpected:
            problems[name] = sorted(unexpected)
    assert not problems, problems


def test_aqe_splits_skewed_join_partitions(spark):
    """The AUTOMATIC skew path (the manual one is salted_join): with AQE
    skew handling on, a 90%-one-key join must show the skew split in the
    FINAL adaptive plan — SortMergeJoin(skew=true) reading skewed-split
    shuffle output — instead of one straggler task owning the hot key."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            (F.col("id") % 1000).alias("pad"),
        )
        right = spark.range(0, 50_000).select(F.col("id").alias("k"), F.lit("r").alias("v"))
        j = left.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        j.collect()  # the DataFrame's own action finalizes the adaptive plan
        plan = plans.physical_plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_interval_join_never_goes_quadratic(spark, sf_smoke, reg):
    """The overlap join's 100 TB contract: the chunk rewrite gives the
    inequality join an equality conjunct, so it plans as a hash/merge
    equi-join — never the BroadcastNestedLoopJoin a raw range predicate
    would produce — and the report-once chunk filter means no
    dedup/distinct exchange downstream of the join."""
    df = reg["events_interval_join"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strategies = plans.join_strategies(df)
    assert strategies and all("NestedLoop" not in s for s in strategies)


def test_hopping_window_expands_in_plan(spark, sf_smoke):
    """The 2x window expansion must be a broadcast of the tiny constant
    relation (never a shuffled join), the events scan must read only
    the 4 projected columns, and the aggregate must have a map-side
    partial before any exchange."""
    from tagmarshal_data_lakehouse_spark.queries.events_ops import (
        q_events_hopping_window,
    )

    df = q_events_hopping_window.build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    strategies = plans.join_strategies(df)
    assert strategies and all("Broadcast" in s for s in strategies)
    assert plan.count("Scan parquet") == 1
    # column pruning: exactly the four projected column:type pairs reach
    # the scan (asserted individually — the exact struct string ordering
    # is a Spark-version/parquet-layout detail, not the contract)
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert sorted(read_schema.split(",")) == sorted(
        [
            "ts:timestamp_ntz",
            "user_id:bigint",
            "event_type:string",
            "value:double",
        ]
    )
    # partial + distinct-expand + final: >= 3 HashAggregates, and only
    # the COUNT DISTINCT's two aggregate-grain exchanges — the 2x
    # expansion itself must not add a shuffle
    assert plan.count("HashAggregate") >= 3
    assert plans.count_exchanges(df) <= 2


def test_bigram_lm_score_stays_token_grain(spark, sf_smoke):
    """The LM score must never widen past the bigram vocabulary: bigram
    formation is a row-local Generate (no self-join on positions), the
    model joins are equi-joins, and no cartesian/BNLJ appears anywhere."""
    from tagmarshal_data_lakehouse_spark.queries import registry

    df = registry()["doc_bigram_lm_score"].build(spark, sf_smoke)
    plan = plans.physical_plan(df)
    strategies = plans.join_strategies(df)
    assert "Generate" in plan  # explode of arrays_zip, not a join
    assert "CartesianProduct" not in plan
    assert all("NestedLoop" not in s for s in strategies)


# ---------------------------------------------------------------------
# r13 optimization-round contracts: the plan shapes the round's measured
# wins depend on (OPTIMIZATION_r13.md batches 3-4) must stay visible.
# ---------------------------------------------------------------------


def test_q18_single_lineitem_scan(spark, sf_smoke, reg):
    """tpch_q18's Spark text is the single-aggregate restructure: ONE
    lineitem scan (the canonical IN+HAVING text planned three)."""
    plan = plans.physical_plan(reg["tpch_q18"].build(spark, sf_smoke))
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1


def test_lsh_bucket_fold_not_duplicated_by_join_filter(spark, sf_smoke, reg):
    """The hyperplane-bucket key is non-nullable (coalesce), so the
    bucket equi-join must not infer an IsNotNull filter that re-inlines
    the O(planes*dim) projection fold below the Project."""
    for name in ("emb_cosine_topk_lsh", "emb_hard_negatives_lsh"):
        plan = plans.physical_plan(reg[name].build(spark, sf_smoke))
        assert not re.search(r"isnotnull\((?:coalesce\()?aggregate\(zip_with", plan), name


def test_minhash_verify_never_builds_union(spark, sf_smoke, reg):
    """verify_jaccard and the verdict verify stage derive |A∪B| from
    per-row distinct counts (inclusion-exclusion), never a per-pair
    array_union."""
    for name in ("doc_minhash_near_dups", "doc_minhash_dedup_verdict"):
        plan = plans.physical_plan(reg[name].build(spark, sf_smoke))
        assert "array_union" not in plan, name


def test_corpus_keywords_single_tokenization(spark, sf_smoke, reg):
    """corpus_keywords tokenizes the corpus ONCE: a single explode
    Generate feeds both the df and tf statistics."""
    plan = plans.physical_plan(reg["doc_corpus_keywords"].build(spark, sf_smoke))
    assert plan.count("Generate explode") == 1
