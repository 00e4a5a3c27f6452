"""Corpus-curation operators: decontamination, repetition analysis, PII
scanning, sequence packing.

These are the quality/safety gates a large-scale training-data pipeline
runs between raw dedup and tokenized output (the C4/Pile-style curation
steps).  Everything stays JVM-side built-ins except sequence packing,
whose greedy reset-on-overflow scan is inherently sequential per shard
and therefore runs as an Arrow-batched applyInPandas over hash shards —
the standard shard-local packing real pipelines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import ensure_parallelism, with_token_grams
from .sampling import hash_bucket
from .text import token_count


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
) -> DataFrame:
    """Train-vs-eval n-gram overlap: for every (train doc, eval doc) pair
    sharing at least one token n-gram, count the shared grams.

    The canonical decontamination check (GPT-3 App. C / The Pile):
    training documents that leak eval-set n-grams inflate benchmark
    scores, so they must be found and dropped before training.

    Scale shape: grams are joined as 64-bit xxhash64 values (8-byte join
    keys, count-identical to string grams modulo ~2^-64 collisions), and
    the eval side is broadcast — eval sets are small by construction
    (thousands of docs), so the corpus-side gram stream never shuffles;
    the only aggregation is the per-pair count.
    """
    def grams_of(df: DataFrame, out_id: str) -> DataFrame:
        g = with_token_grams(ensure_parallelism(df), text_col=text_col, n=ngram, out="grams")
        return g.select(
            F.col(id_col).alias(out_id),
            F.explode(F.transform(F.col("grams"), lambda s: F.xxhash64(s))).alias("gram_hash"),
        )

    train_grams = grams_of(corpus, "train_id")
    eval_grams = grams_of(eval_set, "eval_id")
    return (
        train_grams.join(F.broadcast(eval_grams), "gram_hash")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Within-document repetition profile: gram counts, distinct gram
    counts, repetition ratio, and the most-repeated gram's frequency.

    High repetition ratio (boilerplate, template spam, degenerate
    generations) is a standard drop signal.  ENTIRELY row-local — zero
    shuffles: gram/distinct sizes are array ops, and the top-gram
    frequency is a max-run-length fold over the SORTED gram array
    (equal grams are adjacent after array_sort, so the longest run IS
    the mode count), replacing the naive explode + (doc, gram) groupBy +
    join-back.  At corpus scale that removes the operator's only data
    movement; per-doc cost is O(grams log grams) for the sort.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col),
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
        ).alias("_toks"),
    )
    all_grams = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)), "
        f"i -> array_join(slice(_toks, i, {n}), ' '))"
    )
    top_gram_count = F.expr(
        "aggregate(array_sort(grams), "
        "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
        "(acc, g) -> named_struct("
        "  'prev', g, "
        "  'run', IF(g <=> acc.prev, acc.run + 1L, 1L), "
        "  'best', greatest(acc.best, IF(g <=> acc.prev, acc.run + 1L, 1L))), "
        "acc -> acc.best)"
    )
    return (
        toks.select(F.col(id_col), all_grams.alias("grams"))
        .select(
            F.col(id_col),
            F.size("grams").cast("bigint").alias("n_grams"),
            F.size(F.array_distinct("grams")).cast("bigint").alias("n_distinct_grams"),
            top_gram_count.cast("bigint").alias("top_gram_count"),
        )
        .withColumn(
            "repetition_ratio",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct_grams").cast("double") / F.col("n_grams").cast("double"),
                6,
            ),
        )
        .select(id_col, "n_grams", "n_distinct_grams", "repetition_ratio", "top_gram_count")
    )


_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_URL_RE = r"https?://[^\s]+"
_DIGITS_RE = r"[0-9]{7,}"


def pii_scan(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII-pattern counts (emails, URLs, long digit runs) —
    the cheap regex pre-filter that routes documents to redaction.

    Pure codegen'd regexp_count projections; no shuffle.
    """
    c = F.col(text_col)
    n_emails = F.regexp_count(c, F.lit(_EMAIL_RE)).cast("bigint")
    n_urls = F.regexp_count(c, F.lit(_URL_RE)).cast("bigint")
    n_digits = F.regexp_count(c, F.lit(_DIGITS_RE)).cast("bigint")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        n_digits.alias("n_long_digit_runs"),
        ((n_emails + n_urls + n_digits) > 0).alias("has_pii"),
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    packs, preserving id order within each hash shard.

    Packing (concatenating short documents into full-length training
    sequences) is inherently a sequential reset-on-overflow scan — not
    expressible as a window function — so it runs shard-locally: docs are
    hash-bucketed into `n_shards` shards (row-local, deterministic), and
    each shard is packed independently by an Arrow-batched applyInPandas.
    That is exactly how distributed pipelines pack at 100 TB: global
    packing order is sacrificed (it doesn't matter for training), shard
    packing parallelism is kept.  Documents longer than the budget get a
    dedicated pack and `truncated=true`.

    Output: one row per document with its (shard, pack_id, pos_in_pack,
    offset) placement.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("shard", T.IntegerType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pos_in_pack", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("truncated", T.BooleanType()),
        ]
    )

    budget = int(max_tokens)

    # Closure-local: serialized by value, executors need no package import.
    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        rows = []
        pack_id, used, pos = 0, 0, 0
        for doc_id, shard, n_tok in zip(pdf["doc_id"], pdf["shard"], pdf["n_tokens"]):
            n = int(n_tok)
            if used > 0 and used + n > budget:
                pack_id, used, pos = pack_id + 1, 0, 0
            truncated = n > budget
            rows.append((int(doc_id), int(shard), pack_id, pos, used, n, truncated))
            used += min(n, budget)
            pos += 1
            if truncated:  # oversized doc consumed its pack entirely
                pack_id, used, pos = pack_id + 1, 0, 0
        return pd.DataFrame(
            rows,
            columns=[
                "doc_id", "shard", "pack_id", "pos_in_pack", "offset", "n_tokens", "truncated",
            ],
        )

    with_tokens = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), n_shards).cast("int").alias("shard"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    return with_tokens.groupBy("shard").applyInPandas(pack, out_schema)
