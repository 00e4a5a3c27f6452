"""Deterministic corpus sampling / split operators for training-data prep.

A 100 TB training pipeline needs reproducible selection: the same document
must land in the same split on every engine, every run, every partitioning.
Random() cannot promise that, so every operator here derives its decision
from an md5 content-independent key hash:

    bucket = conv(substr(md5(id), 1, 8), 16, 10) % granularity

md5 is bit-identical across engines (verified against DuckDB), the first 8
hex chars give a uniform 32-bit value, and the modulo maps it to a stable
bucket.  Every operator is a row-local projection/filter — no shuffle, no
RNG state, no driver participation — so the plan is a single codegen'd
scan stage that survives any scale-up untouched.

Reference parity note: the reference has no sampling surface (it is a
telemetry lakehouse); these are the §2-adjacent extensions the build brief
requires for LLM-corpus work, modeled on the deterministic-split idiom
from public data-pipeline literature (hash-mod splits, stratified rates,
mixture balancing a la The Pile / C4 corpus construction).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, granularity: int = 100) -> Column:
    """Stable uniform bucket in [0, granularity) from an id column.

    Portable across engines: Spark `conv(substring(md5(x),1,8),16,10)`
    and DuckDB `('0x' || substr(md5(x),1,8))::BIGINT` produce the same
    integer for the same input string.
    """
    hex8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("bigint") % granularity).alias("bucket")


def oracle_bucket(id_sql: str, granularity: int = 100) -> str:
    """DuckDB spelling of `hash_bucket` (same value, same type)."""
    return (
        f"CAST(('0x' || substr(md5(CAST({id_sql} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" % {granularity}"
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each row a deterministic train/val/test split label.

    Pure row-local projection (no shuffle): the split is a function of the
    id alone, so re-runs, re-partitions, and incremental appends all agree
    — the property that keeps eval sets honest when the corpus grows.
    """
    bucket = hash_bucket(F.col(id_col), 100)
    split = (
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    granularity: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls under its stratum's rate threshold.

    The rates are inlined as a literal CASE expression (no join, no
    broadcast — the rate table is part of the plan), so the whole operator
    is one codegen'd filter over the scan.  Sampling decisions are
    id-stable: raising a stratum's rate strictly grows its sample
    (nested samples), which is what corpus-mixing experiments need.
    """
    bucket = hash_bucket(F.col(id_col), granularity)
    threshold = F.lit(int(default_rate * granularity))
    for value, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * granularity)))
            .otherwise(threshold)
        )
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < threshold).drop("bucket")


def hash_sample_k(df: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Exactly-k uniform sample: global ORDER BY the id's md5, LIMIT k.

    Deterministic reservoir replacement — the "reservoir" is simply the k
    smallest hashes, which Spark executes as TakeOrderedAndProject (each
    partition keeps its local top-k, the driver merges k·n_partitions
    rows, never the data).  Nested property: sample(k) ⊆ sample(k+1).
    """
    return (
        df.withColumn("sort_hash", F.md5(F.col(id_col).cast("string")))
        .orderBy("sort_hash")
        .limit(k)
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    max_weight: int = 64,
) -> DataFrame:
    """Exactly-k WEIGHTED sample without replacement, deterministic and
    engine-independent — the ticket-lottery model.

    Each row holds `weight` integer tickets; ticket i is the md5 of
    (id, i); the row's `sample_key` is its BEST (minimum) ticket, and the
    k smallest keys win (ties impossible up to md5 collision; id breaks
    them anyway). This is exactly uniform sampling of the ticket-expanded
    corpus keeping each row's best ticket, so P(row a outranks row b) =
    w_a / (w_a + w_b) — proportional-to-weight head-to-head odds.

    Why tickets instead of the textbook A-Res key u^(1/w): that key needs
    pow/ln, which are NOT correctly-rounded IEEE ops — two engines (or
    two libm versions) can disagree in the last ulp and flip a marginal
    selection. Ticket keys are hash + string-min only: bit-identical
    everywhere, at the price of row-local work linear in the (capped)
    integer weight.

    Scale shape: ticket generation is a row-local array transform (no
    explode — the min folds inside the row), and the global bottom-k is
    ORDER BY + LIMIT, which Spark executes as TakeOrderedAndProject:
    per-partition local top-k, driver merges k·n_partitions keys, never
    the data. `max_weight` bounds the per-row work; weights are clamped
    to [1, max_weight].
    """
    w = F.least(F.greatest(F.col(weight_col).cast("int"), F.lit(1)), F.lit(int(max_weight)))
    tickets = F.transform(
        F.sequence(F.lit(1), w),
        lambda i: F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"), i.cast("string"))),
    )
    return (
        df.withColumn("sample_weight", w)
        .withColumn("sample_key", F.array_min(tickets))
        .orderBy("sample_key", id_col)
        .limit(k)
    )


def epoch_shuffle(df: DataFrame, epoch: int = 0, id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle order for one training epoch: every
    row gets a dense position 0..n-1 in md5('e{epoch}:' || id) order.

    Training loaders need a reproducible permutation that changes per
    epoch; hashing (epoch, id) gives exactly that — same order on every
    run/engine/partitioning, different order every epoch, and no RNG
    state to ship.

    Scale shape: a naive ROW_NUMBER() OVER (ORDER BY hash) collapses the
    whole corpus into ONE window partition.  Instead the position is
    assembled from the hash's own first byte (an order-preserving prefix,
    values 0..255): global position = (count of rows in lower-valued
    prefix buckets) + (rank within this bucket).  The bucket counts are a
    256-row aggregate (broadcast back), and the within-bucket rank is a
    256-way-parallel window — two shuffles, no single-task stage, at any
    corpus size.  Ties (md5 collisions) are broken by id, so the
    permutation is total and the bucket-prefix decomposition is exact.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(f"e{int(epoch)}:"), F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(id_col),
        key.alias("shuffle_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("_bucket"),
    )
    bucket_counts = keyed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    # 256-row frame: the running-sum window is single-partition but tiny.
    offsets = bucket_counts.select(
        "_bucket",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    in_bucket = (
        F.row_number().over(Window.partitionBy("_bucket").orderBy("shuffle_key", id_col))
        - 1
    )
    return (
        keyed.join(F.broadcast(offsets), "_bucket")
        .select(
            F.col(id_col),
            F.lit(int(epoch)).cast("int").alias("epoch"),
            F.col("shuffle_key"),
            (F.col("_offset") + in_bucket).cast("bigint").alias("epoch_position"),
        )
    )


def mixture_weights(
    df: DataFrame,
    target_shares: Mapping[str, float],
    strata_col: str = "source",
) -> DataFrame:
    """Per-stratum take counts that realize a target corpus mixture.

    Given target shares t_s and available counts n_s, the largest corpus
    honoring every share without upsampling is bounded by the scarcest
    stratum: scale = min_s(n_s / t_s); take_s = floor(t_s * scale).
    Two tiny aggregates (per-stratum count + global min over strata) —
    the stratum frame is orders of magnitude smaller than the corpus, so
    this costs one shuffle of |strata| rows regardless of data size.
    """
    spark = df.sparkSession
    # inline VALUES (LocalRelation), not createDataFrame — no Python->RDD
    # round-trip for a literal rate table
    values = ", ".join(
        "('{}', CAST({} AS DOUBLE))".format(str(k).replace("'", "''"), float(v))
        for k, v in sorted(target_shares.items())
    )
    shares = spark.sql(f"SELECT * FROM VALUES {values} AS t({strata_col}, target_share)")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_available"))
    joined = counts.join(F.broadcast(shares), strata_col, "inner")
    scale = joined.agg(
        F.min(F.col("n_available").cast("double") / F.col("target_share")).alias("scale")
    )
    return (
        joined.crossJoin(F.broadcast(scale))
        .select(
            strata_col,
            "n_available",
            "target_share",
            F.floor(F.col("target_share") * F.col("scale")).cast("bigint").alias("n_take"),
        )
        .withColumn(
            "sample_rate",
            F.round(F.col("n_take").cast("double") / F.col("n_available").cast("double"), 6),
        )
    )


def temperature_mixture(
    df: DataFrame,
    budget: int,
    strata_col: str = "lang",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture sampling: per-stratum take counts
    proportional to n_s^alpha (the multilingual-training standard —
    alpha in (0,1] flattens head strata so low-resource strata are not
    drowned; alpha=1 recovers natural proportions, alpha->0 approaches
    uniform).

    Determinism contract: alpha=0.5 (temperature 2, the common default)
    is computed with SQRT — a CORRECTLY-ROUNDED IEEE op, bit-identical
    in every engine — and the cross-strata normalizer sums the
    DECIMAL-quantized weights exactly, so shares and floor() takes are
    reproducible anywhere. Any other alpha falls back to POW, which is
    libm-dependent (NOT correctly rounded): fine inside one engine,
    excluded from cross-engine oracle checks — same policy as the
    log-free corpus keywords.

    Scale shape: one per-stratum count (|strata| rows out of the
    shuffle), one single-row normalizer broadcast back — cost is
    independent of corpus size, like `mixture_weights`.
    """
    n = F.col("n_available").cast("double")
    weight = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_available"))
        .withColumn("temp_weight", weight)
    )
    total = counts.agg(
        F.sum(F.col("temp_weight").cast("decimal(28,12)")).alias("total_dec")
    )
    share = F.col("temp_weight").cast("decimal(28,12)").cast("double") / F.col(
        "total_dec"
    ).cast("double")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            strata_col,
            "n_available",
            F.round(share, 6).alias("temp_share"),
            F.floor(share * F.lit(int(budget))).cast("bigint").alias("n_take"),
        )
        .withColumn(
            "sample_rate",
            F.round(
                F.least(
                    F.col("n_take").cast("double") / F.col("n_available").cast("double"),
                    F.lit(1.0),
                ),
                6,
            ),
        )
    )


def length_matched_sample(
    candidates: DataFrame,
    target: DataFrame,
    total: int,
    bucket_width: int = 10,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-matched subsampling: select ~`total` candidate
    documents whose token-length DISTRIBUTION matches the target
    corpus's — the domain-matching selection used to align a pretraining
    mix with an eval set or a reference domain (importance sampling on
    the length marginal, the cheapest distribution knob).

    Per fixed-width length bucket b: take_b = (total * target_count_b)
    div target_total (integer-exact in every engine; floor remainders
    are dropped, so the output is at most `total`), and the winners are
    the take_b smallest md5(id) in the candidate bucket — the same
    deterministic reservoir as `hash_sample_k`, per bucket.

    Scale shape: the target side reduces to <= n_buckets rows
    (broadcast); candidates shuffle ONCE on the bucket key for the
    per-bucket row_number. Buckets are few and balanced by construction
    (length marginals are smooth), so the window partitioning cannot go
    pathological; at extreme scale swap the window for a per-bucket
    TakeOrdered loop over n_buckets queries.
    """
    from pyspark.sql.window import Window as W

    from . import text

    def bucketed(df: DataFrame) -> DataFrame:
        n = text.token_count(F.col(text_col))
        return df.withColumn(
            "length_bucket",
            F.least(F.floor(n / bucket_width).cast("int"), F.lit(n_buckets - 1)),
        )

    tgt_counts = bucketed(target).groupBy("length_bucket").agg(
        F.count(F.lit(1)).alias("_n_b")
    )
    tgt_total = tgt_counts.agg(F.sum("_n_b").alias("_n_target"))
    takes = tgt_counts.crossJoin(F.broadcast(tgt_total)).select(
        "length_bucket",
        F.expr(f"CAST(({int(total)} * _n_b) DIV _n_target AS INT)").alias("_take_n"),
    )
    cands = bucketed(candidates).withColumn(
        "sort_hash", F.md5(F.col(id_col).cast("string"))
    )
    w = W.partitionBy("length_bucket").orderBy("sort_hash")
    return (
        cands.join(F.broadcast(takes), "length_bucket")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_take_n"))
        .drop("_rn", "_take_n")
    )
