"""Distribution-shape operators: skew-resistant joins and aggregations.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but two shapes still need explicit structure at
100 TB:

- a shuffle join where one side's keys are pathologically hot (a few
  keys own a double-digit share of rows): `salted_join` spreads each hot
  key over `salt_factor` reducers by salting the big side and replicating
  the small side per salt;
- exact COUNT(DISTINCT) over skewed groups, where all values of a hot
  group meet in one reducer: `two_phase_distinct` dedups on (key, value)
  first — that shuffle is spread by the value — then counts per key.

Both transforms are semantically invisible (same rows out as their naive
forms — oracle-checked in the registry) and purely structural: no UDFs,
no state, plain codegen'd columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_col: str | Column,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over `salt_factor`
    reducers.

    `salt_col` must be a column (name or expression) unique-ish per big
    row (a row id); the salt is `xxhash64(salt_col) % salt_factor` —
    DETERMINISTIC, so task retries recompute identical salts (`rand()`
    salts can silently corrupt a retried shuffle — never use them in a
    join key).  The small side is replicated `salt_factor` times via
    explode, so choose a factor that keeps |small| * factor broadcastable
    or at least shuffle-cheap.

    Join key becomes (on, salt): each formerly-hot reducer key now maps
    to `salt_factor` distinct shuffle keys.  Output columns match a plain
    `big.join(small, on, how)`.
    """
    if isinstance(salt_col, str):
        salt_col = F.col(salt_col)
    salted_big = big.withColumn("_salt", F.pmod(F.xxhash64(salt_col), F.lit(salt_factor)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt_factor)]))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def two_phase_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) that survives hot keys.

    Phase 1 shuffles on (key, value) — the value component spreads a hot
    key's rows across reducers — and dedups; phase 2 shuffles only the
    already-deduped rows on the key.  Same result as
    ``groupBy(key).agg(countDistinct(value))``, but no single reducer
    ever sees all rows of a hot key.
    """
    deduped = df.select(*key_cols, value_col).distinct()
    return deduped.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("bigint").alias(out))


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table hash-bucketed (and bucket-sorted)
    on `keys`.

    Bucketing is the 100 TB answer to a join or aggregation that recurs
    on the same key: pay the partitioning shuffle ONCE at write time,
    then every subsequent join/groupBy on `keys` between co-bucketed
    tables runs with zero Exchange (each task zips bucket i with bucket
    i).  `sort=True` additionally orders rows within each bucket so the
    sort-merge join skips its sort step.  Contract-tested in
    tests/test_plan_quality.py: co-bucketed fact-fact join plans
    SortMergeJoin with NO shuffle on either side.

    Catalog-managed (saveAsTable) because bucket metadata lives in the
    table catalog, not the files; on a cluster this is the metastore.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables (see `write_bucketed`).

    Plain `.join` — Spark reads each side's bucket spec from the catalog
    and, when both sides are bucketed on their join keys with compatible
    bucket counts, satisfies the join's distribution requirement from
    the files themselves: no Exchange, no network, scales linearly with
    bucket count on a 1000-executor cluster.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave key over numeric columns.

    Linear sort clusters files along ONE dimension; predicates on any
    other column still touch every file.  The Z-curve interleaves the
    bit patterns of each column's normalized rank, so file-contiguous
    key ranges are HYPERCUBES: parquet min/max stats then prune files
    for predicates on ANY of the participating columns (the
    Delta/Iceberg OPTIMIZE ZORDER BY role).

    Normalization is min/max linear to [0, 2^bits): one tiny aggregate
    collects 2 doubles per column to the driver (at 100 TB this is the
    same O(cols) job OPTIMIZE runs); the key itself is a codegen'd
    bit-interleave expression — no UDF, no shuffle beyond the
    range-partitioning the caller applies to the key.  Columns with a
    degenerate (constant) range contribute zero bits, harmlessly.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 62:
        # interleaved key must fit a signed 64-bit long without touching
        # the sign bit (bit 63) — shrink bits for wide column sets
        raise ValueError(
            f"bits({bits}) * cols({len(cols)}) = {bits * len(cols)} exceeds 62; "
            f"use bits <= {62 // len(cols)}"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).first()
    n = len(cols)
    max_q = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        width = (hi - lo) or 1.0
        q = F.floor(
            (F.col(c).cast("double") - F.lit(lo)) / F.lit(width) * max_q
        ).cast("bigint")
        quantized.append(F.least(F.greatest(q, F.lit(0)), F.lit(max_q)))
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, q in enumerate(quantized):
            key = key + F.shiftleft(
                F.shiftrightunsigned(q, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return key


def key_skew_profile(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key diagnostic: the top-N keys by row count with their share
    of total and a skew ratio vs the mean key population.

    This is the measurement that decides between a plain shuffle join,
    `salted_join`, and AQE skew splitting — run it BEFORE picking a
    distribution strategy for a new 100 TB key.  One map-side-combined
    count aggregate + a tiny top-N (TakeOrderedAndProject); the global
    totals ride along as a single-row broadcast-joined aggregate, so
    nothing rescans the fact.
    """
    counts = df.groupBy(F.col(key)).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total_rows"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            F.col(key),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("_total_rows"), 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("_total_rows") / F.col("_n_keys")), 4
            ).alias("skew_vs_mean"),
        )
        .orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .limit(top)
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile: rows, nulls, exact distincts, min/max.

    The ANALYZE-TABLE / pre-training data-profiling role.  All columns
    profile in ONE aggregate over ONE scan (count + null-count + min +
    max combine map-side; the exact COUNT(DISTINCT) set is the only
    shuffled state — swap in approx_count_distinct at 100 TB if 2%
    error is acceptable, the rest of the plan is unchanged).  min/max
    are computed in the column's native type and cast to string only
    for the uniform long-format output.
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    ).selectExpr(
        "column_name",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(n_nulls AS BIGINT) AS n_nulls",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
        "min_value",
        "max_value",
    )


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    anti: bool = False,
) -> DataFrame:
    """Approximate semi (or anti) join of a huge frame against a small
    key set, with ZERO data movement on the big side.

    The standard big-side prefilter at 100 TB: fold the key set into a
    Bloom bitset once (driver-side collect of bit positions — the key
    frame is small by contract), then filter the big side with a
    row-local might-contain expression.  One-sided error:

    - semi (`anti=False`): keeps every true match plus ~FPR false
      positives — chain the exact join on the survivors; the filter has
      already discarded the overwhelming non-matching mass shuffle-free.
    - anti (`anti=True`): drops every true match plus ~FPR false
      positives — use only where over-dropping a few-in-a-million rows
      is acceptable (dedup-style pipelines), never for audit-exact
      anti-join semantics.

    Implemented on the same bitset helpers as the corpus decontamination
    operator (training.curation.eval_bloom_bits / bloom_membership), so
    the membership expression is identical batch vs streaming.
    """
    from ..training.curation import bloom_bits, bloom_membership

    words = bloom_bits(
        keys.select(F.col(on).cast("string").alias("_k")), "_k", num_bits, num_hashes
    )
    hit = bloom_membership(words, num_bits, num_hashes)(F.col(on).cast("string"))
    return big.filter(~hit if anti else hit)


def derive_chunk_micros(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    floor_micros: int = 60_000_000,
) -> int:
    """Derive the interval-join chunk width from the data: the larger of
    the two sides' MEDIAN interval lengths (one-row percentile aggregate
    per side, nothing shuffled at interval grain).

    The skew probe measured chunk ≈ interval length worth 1.7x on a
    hot-both-sides workload (SCALE.md round 6): chunks much longer than
    the intervals concentrate unrelated intervals on one join key, while
    much shorter chunks explode every interval into length/chunk rows.
    Taking the MAX of the two medians bounds the typical-longer side's
    explosion factor at ~2 rows per interval and keeps the key space as
    fine as that bound allows. The floor guards degenerate data
    (sub-second intervals must not produce micro-chunks whose key count
    explodes the sequence()).
    """
    def lens(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(F.col(e) > F.col(s)).select(
            F.expr(f"TIMESTAMPDIFF(MICROSECOND, {s}, {e})").alias("_len")
        )

    # both medians in ONE Spark job (a tagged union + grouped
    # percentile), not one eager collect per side
    row = (
        lens(left, l_start, l_end)
        .withColumn("_side", F.lit("l"))
        .unionByName(lens(right, r_start, r_end).withColumn("_side", F.lit("r")))
        .groupBy("_side")
        .agg(F.expr("percentile_approx(_len, 0.5)").alias("m"))
        .agg(F.max("m").alias("m"))
        .collect()[0]
    )
    return max(int(row["m"] or 0), floor_micros)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    chunk_micros: int | None = None,
) -> DataFrame:
    """Overlap join of two half-open NTZ-interval sets — `[l_start,
    l_end) ∩ [r_start, r_end) ≠ ∅` — as an EQUI-join shuffle instead of
    the nested loop Spark plans for a pure inequality condition.

    A raw `l.start < r.end AND r.start < l.end` join has no equality
    conjunct, so Catalyst can only pick BroadcastNestedLoopJoin (or
    CartesianProduct): O(|L|·|R|) comparisons, the classic 100 TB
    scale-killer.  The chunked rewrite is the standard distributed
    interval-join shape (Flink's interval join / spatial grid joins):

    1. cut time into fixed `chunk_micros` chunks;
    2. explode each interval to the chunk ids it covers (row-local
       `sequence` — no shuffle, no UDF);
    3. equi-join on chunk id — a plain shuffled hash/sort-merge join
       whose key spreads work across every executor;
    4. refine with the exact overlap predicate;
    5. emit each matching pair EXACTLY once — only from the chunk that
       contains the overlap's start (`greatest(l_start, r_start)`) —
       so no dedup/distinct pass is ever needed.

    Pick `chunk_micros` near the typical interval length: intervals
    explode into `O(length/chunk + 1)` rows, and chunks much smaller
    than the data's span keep any single join key from going hot.
    The DEFAULT (`chunk_micros=None`, since round 8) derives that
    choice from the data (`derive_chunk_micros`: the larger of the two
    sides' median interval lengths, both medians in ONE Spark job —
    the skew probe measured the matched chunk worth 1.7x on hot
    workloads); pass an explicit width to skip the derivation job when
    the interval scale is known (e.g. day-grain sessions:
    86_400_000_000). The chunk width NEVER affects the result (each
    pair is emitted exactly once from the overlap-start chunk,
    whatever the chunking), so auto-derivation is a pure plan
    decision.
    Contract: interval columns are NTZ timestamps, empty intervals
    (end <= start) are dropped, and the two frames' column names must
    be disjoint (the output carries both sides' columns unchanged).
    """
    if chunk_micros is None:
        chunk_micros = derive_chunk_micros(left, right, l_start, l_end, r_start, r_end)

    # Construction is selectExpr/where/F.expr strings rather than
    # chained withColumns (r13 optimization pass — driver-side build
    # cost: each withColumn is a plan-rebuilding py4j roundtrip; the
    # parsed trees, and therefore the plan and results, are identical).
    def us(col: str) -> str:
        return f"TIMESTAMPDIFF(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"

    lhs = (
        left.where(f"`{l_end}` > `{l_start}`")
        .selectExpr("*", f"{us(l_start)} AS _ls_us", f"{us(l_end)} AS _le_us")
        .selectExpr(
            "*",
            f"explode(sequence(_ls_us div {chunk_micros},"
            f" (_le_us - 1) div {chunk_micros})) AS _l_chunk",
        )
    )
    rhs = (
        right.where(f"`{r_end}` > `{r_start}`")
        .selectExpr("*", f"{us(r_start)} AS _rs_us", f"{us(r_end)} AS _re_us")
        .selectExpr(
            "*",
            f"explode(sequence(_rs_us div {chunk_micros},"
            f" (_re_us - 1) div {chunk_micros})) AS _r_chunk",
        )
    )
    joined = lhs.join(
        rhs,
        F.expr(
            f"(_l_chunk = _r_chunk) AND (`{l_start}` < `{r_end}`)"
            f" AND (`{r_start}` < `{l_end}`)"
            f" AND (_l_chunk = greatest(_ls_us, _rs_us) div {chunk_micros})"
        ),
        "inner",
    )
    return joined.drop("_ls_us", "_le_us", "_l_chunk", "_rs_us", "_re_us", "_r_chunk")
