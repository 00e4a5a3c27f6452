"""Distributed BPE merge training (Sennrich et al. 2016) — the
tokenizer-training inner loop, Spark-first.

Classic BPE trains on a WORD-FREQUENCY dictionary, not the raw corpus:
the corpus contributes exactly one aggregation (distinct word -> count),
and every merge iteration then runs over that far smaller table.  That
is also the only shape that survives 100 TB — the corpus is touched
once, the loop's per-iteration cost is O(|vocab|):

1. word counts — one explode + groupBy over the corpus (the single
   corpus-scale shuffle);
2. each iteration: adjacent-pair counts weighted by word frequency
   (row-local transform + explode over the word table, one aggregate),
   deterministic argmax (count desc, then pair lexicographic), then a
   row-local left-to-right fold applies the merge to every word's unit
   array.  `localCheckpoint` truncates the lineage per iteration —
   without it the plan nests one fold per merge (the iterative-Spark
   trap, same mitigation as dedup.connected_components).

Merging and counting follow the reference algorithm exactly: pair
counts include overlapping occurrences (zip(units, units[1:])), merges
apply greedily left-to-right — pinned equal to a pure-Python BPE
implementation in tests/test_training_bpe.py on arbitrary corpora.

CORPUS-DERIVED values (the merge pair literals, which are arbitrary
text fragments) enter the plan only through Column lambdas and F.lit —
never string interpolation — so corpus text containing quotes cannot
break or inject into the plan.  The two F.expr sites interpolate only
fixed column identifiers chosen by this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def _adjacent_pairs(units_col: str) -> Column:
    """Overlapping adjacent (a, b) unit pairs of one word, as structs."""
    return F.when(
        F.size(units_col) >= 2,
        F.expr(
            f"transform(sequence(1, size({units_col}) - 1), "
            f"i -> struct({units_col}[i-1] AS a, {units_col}[i] AS b))"
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _apply_merge(units_col: Column, a: str, b: str) -> Column:
    """Left-to-right greedy merge of adjacent (a, b) -> a||b, as a
    row-local fold (the accumulator's last element is the lookbehind)."""
    return F.aggregate(
        units_col,
        F.array().cast("array<string>"),
        lambda acc, u: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (u == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(u))),
    )


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct word -> corpus frequency: the one corpus-scale pass."""
    return (
        df.select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn the BPE merge table: (rank, left, right, pair_count).

    Deterministic: the argmax tie-breaks by (count desc, left asc,
    right asc), and every step is exact integer arithmetic — the same
    corpus yields the same merges on every run, partitioning, and
    engine (pinned vs a pure-Python reference implementation).
    """
    spark = df.sparkSession
    units = (
        word_frequency_table(df, text_col)
        .withColumn("units", F.expr("split(w, '')"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        top = (
            units.select(F.col("n"), F.explode(_adjacent_pairs("units")).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .first()
        )
        if top is None or top["cnt"] < min_pair_freq:
            break
        merges.append((rank, top["a"], top["b"], int(top["cnt"])))
        units = units.withColumn(
            "units", _apply_merge(F.col("units"), top["a"], top["b"])
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode text into subword units with a learned merge list — one
    row-local expression (per word: a fold per merge in rank order,
    matching training's word-internal merges; results flattened), no
    UDF, no state; usable identically on batch and streaming frames."""

    def encode_word(w: Column) -> Column:
        units = F.split(w, "")
        for a, b in merges:
            units = _apply_merge(units, a, b)
        return units

    words = F.filter(
        F.split(normalize_text(col), " "), lambda w: F.length(w) > 0
    )
    return F.flatten(F.transform(words, encode_word))
