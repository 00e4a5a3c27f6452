"""Property-based tests (hypothesis) for the deterministic operators:
invariants that must hold for ARBITRARY inputs, not just fixtures.

Spark-session-per-example would be ~1 s/case, so the properties are
verified on the driver-side pure logic where possible (bucket math,
mixture arithmetic) and on batched Spark runs (one DataFrame per
property, many generated rows inside it) where the operator itself is
distributed.
"""

from __future__ import annotations

import hashlib

from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.training import sampling


def _py_bucket(value: int, granularity: int) -> int:
    """Reference implementation of sampling.hash_bucket in pure Python."""
    hex8 = hashlib.md5(str(value).encode()).hexdigest()[:8]
    return int(hex8, 16) % granularity


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50, unique=True))
@settings(max_examples=20, deadline=None)
def test_hash_bucket_matches_pure_python(spark, ids):
    """The Spark md5-bucket must equal the straightforward Python md5
    bucket for any id — the portability contract the oracles rely on."""
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["bucket"]
        for r in df.select("doc_id", sampling.hash_bucket(F.col("doc_id"), 100)).collect()
    }
    assert got == {i: _py_bucket(i, 100) for i in ids}


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200, unique=True),
    st.integers(min_value=1, max_value=99),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=50, deadline=None)
def test_split_assignment_is_total_and_stable(ids, train_pct, val_pct):
    """Driver-side property: the split rule is a total function of the
    bucket, and nested w.r.t. growing train share."""
    assume(train_pct + val_pct < 100)
    for i in ids:
        b = _py_bucket(i, 100)
        split = "train" if b < train_pct else ("val" if b < train_pct + val_pct else "test")
        # growing the train share never moves a train row out of train
        wider = "train" if b < train_pct + 1 else ("val" if b < train_pct + 1 + val_pct else "test")
        if split == "train":
            assert wider == "train"
        assert split in ("train", "val", "test")


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.floats(min_value=0.01, max_value=1.0),
        min_size=2,
        max_size=5,
    ),
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=5,
        max_size=5,
    ),
)
@settings(max_examples=100, deadline=None)
def test_mixture_arithmetic_never_upsamples(shares, counts):
    """Driver-side property of the mixture formula: take_s <= n_s always,
    and the binding stratum is taken (nearly) whole."""
    total_share = sum(shares.values())
    norm = {k: v / total_share for k, v in shares.items()}
    scale = min(counts[k] / t for k, t in norm.items())
    takes = {k: int(t * scale) for k, t in norm.items()}
    for k, take in takes.items():
        assert 0 <= take <= counts[k]
    binding = min(norm, key=lambda k: counts[k] / norm[k])
    assert takes[binding] >= counts[binding] - 1


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), st.sampled_from(["a b c", "d e f", "g h i", "j k"])),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.lists(st.sampled_from(["a b c", "d e f", "x y z"]), max_size=3, unique=True),
)
@settings(max_examples=15, deadline=None)
def test_incremental_dedup_matches_pure_python(spark, batch_rows, corpus_texts):
    """Delta-vs-corpus dedup must agree with the obvious sequential
    Python implementation for arbitrary batches and corpora."""
    from tagmarshal_data_lakehouse_spark.training import dedup as tdedup

    corpus_digests = {
        hashlib.md5(" ".join(t.lower().split()).encode()).hexdigest() for t in corpus_texts
    }
    expected = {}
    seen: set[str] = set()
    for doc_id, text in sorted(batch_rows):
        digest = hashlib.md5(" ".join(text.lower().split()).encode()).hexdigest()
        in_corpus = digest in corpus_digests
        in_batch = digest in seen
        seen.add(digest)
        expected[doc_id] = (in_corpus, in_batch, not in_corpus and not in_batch)

    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)] or [(0, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["dup_of_corpus"], r["dup_within_batch"], r["keep"])
        for r in tdedup.incremental_dedup(batch, corpus).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.integers(min_value=0, max_value=300),  # token counts per doc
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=2, max_value=64),   # max_tokens
    st.integers(min_value=1, max_value=64),   # stride (clamped below)
)
@settings(max_examples=15, deadline=None)
def test_chunk_windows_invariants(spark, token_counts, max_tokens, stride):
    """For arbitrary doc lengths and window params: chunk count matches
    the closed form, every token is covered exactly by the union of
    chunks, and no chunk exceeds the window."""
    from tagmarshal_data_lakehouse_spark.training import curation

    stride = min(stride, max_tokens)
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)) if n else "")
        for i, n in enumerate(token_counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.chunk_windows(df, max_tokens=max_tokens, stride=stride).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    import math

    for i, n in enumerate(token_counts):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_index"])
        expected = 0 if n == 0 else 1 + math.ceil(max(n - max_tokens, 0) / stride)
        assert len(chunks) == expected, (n, max_tokens, stride)
        covered = set()
        for c in chunks:
            assert 1 <= c["n_chunk_tokens"] <= max_tokens
            covered |= set(
                range(c["chunk_start_token"], c["chunk_start_token"] + c["n_chunk_tokens"])
            )
        assert covered == set(range(n))


def _py_ticket_key(doc_id: int, w: int) -> str:
    """Reference ticket-lottery key: min md5 over w tickets."""
    return min(
        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest() for i in range(1, w + 1)
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=-5, max_value=100),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=10, deadline=None)
def test_weighted_sample_matches_pure_python(spark, rows, k):
    """Spark's ticket-lottery selection must equal the pure-Python
    reference for arbitrary ids/weights (including clamp cases) — the
    cross-engine portability the DuckDB oracle relies on."""
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["sample_key"])
        for r in sampling.weighted_sample_k(df, k=k, weight_col="w", max_weight=16).collect()
    ]
    expected = sorted(
        ((i, _py_ticket_key(i, min(max(w, 1), 16))) for i, w in rows),
        key=lambda t: (t[1], t[0]),
    )[:k]
    assert got == expected


@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_tf_cosine_matches_brute_force_random_corpora(spark, token_lists):
    """TF-cosine over arbitrary tiny corpora equals the brute-force
    reference (uncapped): every materialized pair shares a term and
    scores round(dot / (|a||b|), 6)."""
    import itertools
    import math
    from collections import Counter

    from tagmarshal_data_lakehouse_spark.training import dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["dot"], r["cosine"])
        for r in dedup.tf_cosine_pairs(df, threshold=0.0, max_doc_freq=1 << 30).collect()
    }
    tf = {i: Counter(toks) for i, toks in enumerate(token_lists)}
    for a, b in itertools.combinations(sorted(tf), 2):
        dot = sum(tf[a][t] * tf[b][t] for t in tf[a])
        if dot == 0:
            assert (a, b) not in got
            continue
        na = math.sqrt(sum(v * v for v in tf[a].values()))
        nb = math.sqrt(sum(v * v for v in tf[b].values()))
        assert got[(a, b)][0] == dot
        assert abs(got[(a, b)][1] - round(dot / (na * nb), 6)) < 1e-9


_INTERVAL = st.tuples(
    st.integers(min_value=0, max_value=500),  # start minute
    st.integers(min_value=-5, max_value=500),  # length (<=0 -> empty/invalid)
)


@given(
    st.lists(_INTERVAL, min_size=1, max_size=12),
    st.lists(_INTERVAL, min_size=1, max_size=12),
    st.sampled_from([7, 60, 240]),  # chunk minutes: tiny / typical / coarse
)
@settings(max_examples=12, deadline=None)
def test_interval_overlap_join_property(spark, lefts, rights, chunk_min):
    """For ARBITRARY interval sets and chunk sizes the chunked equi-join
    rewrite must emit exactly the naive half-open-overlap pair multiset:
    no pair lost across chunk boundaries, no pair duplicated from shared
    chunks, empty intervals dropped."""
    from tagmarshal_data_lakehouse_spark.operators import interval_overlap_join

    def ntz(col):
        return F.expr(
            f"TIMESTAMPADD(MINUTE, CAST({col} AS INT), TIMESTAMP_NTZ '2024-01-01')"
        )

    ldf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(lefts)], "l_id long, ls long, le long"
    ).select("l_id", ntz("ls").alias("l_start"), ntz("le").alias("l_end"))
    rdf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(rights)], "r_id long, rs long, re long"
    ).select("r_id", ntz("rs").alias("r_start"), ntz("re").alias("r_end"))

    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            ldf, rdf, "l_start", "l_end", "r_start", "r_end",
            chunk_micros=chunk_min * 60_000_000,
        ).collect()
    )
    expected = sorted(
        (li, ri)
        for li, (ls, ll) in enumerate(lefts)
        for ri, (rs, rl) in enumerate(rights)
        if ll > 0 and rl > 0 and ls < rs + rl and rs < ls + ll
    )
    assert got == expected


_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _py_minhash_verdicts(
    texts: dict[int, str], num_perm: int, bands: int, n: int, threshold: float
) -> dict[int, int | None]:
    """Pure-Python twin of training.dedup.minhash_dedup_verdicts — the
    same md5-string minhash, banding, lowest-id representative election
    and exact-Jaccard verify the DuckDB oracle spells in SQL."""
    import re

    def gram_set(t: str) -> frozenset[str]:
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        k = max(len(toks) - n + 1, 1)
        return frozenset(" ".join(toks[i : i + n]) for i in range(k))

    rpb = num_perm // bands
    grams = {d: gram_set(t) for d, t in texts.items()}
    sigs = {
        d: [
            min(hashlib.md5(f"{p}:{g}".encode()).hexdigest() for g in gs)
            for p in range(num_perm)
        ]
        for d, gs in grams.items()
    }
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, sig in sigs.items():
        for b in range(bands):
            key = hashlib.md5("|".join(sig[b * rpb : (b + 1) * rpb]).encode()).hexdigest()
            buckets.setdefault((b, key), []).append(d)
    verdicts: dict[int, int | None] = {d: None for d in texts}
    for members in buckets.values():
        rep = min(members)
        for d in members:
            if d == rep:
                continue
            a, bset = grams[d], grams[rep]
            if round(len(a & bset) / len(a | bset), 6) >= threshold:
                if verdicts[d] is None or rep < verdicts[d]:
                    verdicts[d] = rep
    return verdicts


@given(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None)
def test_minhash_verdicts_match_pure_python(spark, texts):
    """For ARBITRARY small-vocabulary corpora (engineered for heavy gram
    overlap and band collisions) the Spark verdict frame must equal the
    pure-Python reference exactly: same drops, same representatives,
    same keeps. Doc sizes stay <=12 tokens so no Jaccard ratio can land
    on a half-ULP rounding tie (|A∪B| < 128 — the smallest denominator
    where round-to-6 HALF_UP and half-even can disagree)."""
    from tagmarshal_data_lakehouse_spark.training import dedup as tdedup

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dup_of"]
        for r in tdedup.minhash_dedup_verdicts(
            df, num_perm=8, bands=4, ngram=3, threshold=0.5
        ).collect()
    }
    expected = _py_minhash_verdicts(dict(rows), num_perm=8, bands=4, n=3, threshold=0.5)
    assert got == expected


@given(
    st.integers(min_value=2, max_value=40),   # cluster rows
    st.integers(min_value=2, max_value=8),    # dimensions
    st.integers(min_value=1, max_value=64),   # block budget (elements)
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_chunked_gemm_drops_equal_full_triu(n, d, block_elems, seed):
    """For ARBITRARY matrices and block budgets (down to 1-element
    budgets, i.e. one row per block) the chunked scorer must equal the
    single-allocation full-upper-triangle reference exactly — including
    zero vectors (norm guard) and NaN rows (IEEE comparisons never
    drop). This makes the r9 review's ad-hoc 300-fixture fuzz a
    standing property."""
    import numpy as np

    from tagmarshal_data_lakehouse_spark.training.similarity import (
        _chunked_upper_tri_drops,
    )

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d))
    if n >= 4:
        mat[n - 1] = mat[0]          # one planted exact dup
        mat[n - 2] = 0.0             # zero vector
    if n >= 6 and seed % 3 == 0:
        mat[n - 3, 0] = float("nan")  # NaN row
    ids = np.arange(n, dtype=np.int64)
    threshold = 0.9

    # reference: the pre-r9 full-matrix formulation
    norm = np.sqrt((mat * mat).sum(axis=1))
    norm[norm == 0.0] = 1.0
    sims = (mat @ mat.T) / np.outer(norm, norm)
    ia, ib = np.triu_indices(n, k=1)
    with np.errstate(invalid="ignore"):
        hit = np.round(sims[ia, ib], 6) >= threshold
    expected = sorted(np.unique(ids[ib[hit]]))

    got = sorted(_chunked_upper_tri_drops(ids, mat, threshold, block_elems=block_elems))
    assert got == expected
