"""BPE merge-training semantics: the distributed trainer must produce
EXACTLY the merge list of the reference algorithm (pure-Python
Sennrich-style BPE over the same word-frequency dict), and the
expression-level encoder must match the reference encoder."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.training import bpe


def _py_bpe(word_counts: dict[str, int], n_merges: int, min_pair_freq: int = 2):
    """Reference implementation: overlapping pair counts weighted by word
    frequency; argmax tie-broken (count desc, left asc, right asc);
    left-to-right greedy merge application."""
    units = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        cnt: dict[tuple[str, str], int] = {}
        for w, n in word_counts.items():
            u = units[w]
            for x, y in zip(u, u[1:]):
                cnt[(x, y)] = cnt.get((x, y), 0) + n
        if not cnt:
            break
        (a, b), n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_freq:
            break
        merges.append((rank, a, b, n))
        for w, u in units.items():
            out: list[str] = []
            for tok in u:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            units[w] = out
    return merges, units


def _py_encode(text: str, merges) -> list[str]:
    out_units: list[str] = []
    for w in " ".join(text.lower().split()).split(" "):
        if not w:
            continue
        u = list(w)
        for _, a, b, _ in merges:
            nxt: list[str] = []
            for tok in u:
                if nxt and nxt[-1] == a and tok == b:
                    nxt[-1] = a + b
                else:
                    nxt.append(tok)
            u = nxt
        out_units.extend(u)
    return out_units


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest newest newest"),
    (3, "newest newest widest widest widest"),
    (4, "the quick brown fox and the lazy dog and the end"),
]


def test_bpe_merges_match_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wc = {
        r["w"]: r["n"] for r in bpe.word_frequency_table(df).collect()
    }
    expected, _ = _py_bpe(wc, n_merges=12)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe.bpe_train_merges(df, n_merges=12).orderBy("rank").collect()
    ]
    assert got == expected


def test_bpe_merges_deterministic(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a = bpe.bpe_train_merges(df, n_merges=6).collect()
    b = bpe.bpe_train_merges(df.repartition(7), n_merges=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partitioning-independent


def test_apply_merges_matches_reference_encoder(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe.bpe_train_merges(df, n_merges=8).orderBy("rank").collect()
    ]
    pairs = [(m[1], m[2]) for m in merges]
    enc = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", bpe.apply_merges(F.col("text"), pairs).alias("u")
        ).collect()
    }
    for doc_id, text in CORPUS:
        assert enc[doc_id] == _py_encode(text, merges), doc_id
    # encoding is lossless modulo normalization: units rejoin to the words
    for doc_id, text in CORPUS:
        assert "".join(enc[doc_id]) == "".join(text.lower().split())


def test_bpe_encode_registry_query_counts(spark, sf_smoke):
    """The registry's train-then-encode entry: every document gets a
    unit count, merges actually fire (multi-char units appear), and
    n_bpe_units + per-word merge count stays consistent with the
    whitespace token count (each merge reduces units by one)."""
    from tagmarshal_data_lakehouse_spark.queries import registry

    rows = registry()["doc_bpe_encode"].build(spark, sf_smoke).collect()
    assert len(rows) > 0
    assert all(r["n_bpe_units"] >= 1 for r in rows)
    assert any(r["n_merged_units"] > 0 for r in rows)
    assert all(" " in r["head_units"] or r["n_bpe_units"] <= 12 for r in rows)
