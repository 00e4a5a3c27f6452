"""Similarity search over embedding columns (array<float>).

Two paths, as the scale plan requires:
- `cosine_topk_exact`: brute-force top-k — the correctness baseline.
  Dot products are computed via explode + exact DECIMAL partial sums so
  results are bit-reproducible across engines and partitionings (see
  queries/__init__.py determinism contract).  Cost O(|Q|·|C|·d): fine
  for a bounded query set, never for all-pairs at scale.
- `cosine_topk_lsh`: random-hyperplane LSH bucketing (sign sketch) —
  the 100 TB path: candidates only from matching buckets, shuffle keyed
  by bucket hash, then exact re-scoring of candidates.
- `cosine_topk_fast`: same brute force but with JVM `aggregate`/
  `zip_with` double math (no explode) — the single-engine fast path used
  by bench; not oracle-checked because float summation order differs
  across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def _norms_decimal(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Exact squared L2 norm per vector via decimal sums of x*x."""
    exploded = df.select(F.col(id_col), F.explode(vec_col).alias("x"))
    prod = (F.col("x").cast("double") * F.col("x").cast("double")).cast("decimal(28,18)")
    return exploded.groupBy(id_col).agg(F.sum(prod).alias("norm2_dec"))


def cosine_topk_exact(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic brute-force cosine top-k for the first `n_queries`
    vectors (by id) against all others.

    Decimal-exact dot products -> identical ranking in any engine; ties
    broken by candidate id.
    """
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    queries = vecs.filter(F.col(id_col) < n_queries)
    q_elem = queries.select(
        F.col(id_col).alias("query_id"), F.posexplode(vec_col).alias("pos", "qx")
    )
    c_elem = vecs.select(
        F.col(id_col).alias("candidate_id"), F.posexplode(vec_col).alias("pos", "cx")
    )
    prod = (F.col("qx").cast("double") * F.col("cx").cast("double")).cast("decimal(28,18)")
    dots = (
        q_elem.join(c_elem, "pos")
        .filter(F.col("query_id") != F.col("candidate_id"))
        .groupBy("query_id", "candidate_id")
        .agg(F.sum(prod).alias("dot_dec"))
    )
    norms = _norms_decimal(embeddings, id_col, vec_col)
    qn = norms.select(F.col(id_col).alias("query_id"), F.col("norm2_dec").alias("qn2"))
    cn = norms.select(F.col(id_col).alias("candidate_id"), F.col("norm2_dec").alias("cn2"))
    scored = (
        dots.join(qn, "query_id")
        .join(cn, "candidate_id")
        .withColumn(
            "cosine",
            F.round(
                F.col("dot_dec").cast("double")
                / (F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))),
                6,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("candidate_id").asc())
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "candidate_id", "cosine", F.col("nn_rank").cast("int").alias("nn_rank"))
    )


def cosine_topk_fast(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bench-path brute force: JVM higher-order functions, no explode.

    One broadcast of the (small) query set against a scan of candidates —
    at scale the candidate side stays partitioned and never shuffles.
    """
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    queries = vecs.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cands = vecs.select(F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("cvec"))
    dot = F.expr(_DOT.format(a="qvec", b="cvec"))
    qq = F.expr(_DOT.format(a="qvec", b="qvec"))
    cc = F.expr(_DOT.format(a="cvec", b="cvec"))
    scored = (
        cands.join(F.broadcast(queries), F.col("query_id") != F.col("candidate_id"))
        .withColumn("cosine", F.round(dot / (F.sqrt(qq) * F.sqrt(cc)), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("candidate_id").asc())
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "candidate_id", "cosine", F.col("nn_rank").cast("int").alias("nn_rank"))
    )


def _bucket_col(vec_col: str, n_planes: int) -> F.Column:
    """Packed sign-bit bucket, computed row-locally (no explode/shuffle).

    Plane j's normal is a deterministic pseudo-random vector derived from
    xxhash64(position, j) — reproducible with no stored model.  Each
    projection is a sequential left-fold (`aggregate`), so the float sum
    order is fixed and the bucket is deterministic."""
    terms = []
    for j in range(n_planes):
        proj = (
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
            f"(x, i) -> cast(x as double) * (cast(xxhash64(i, {j}) % 10007 as double) / 1.0007e4)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
        terms.append(f"CASE WHEN {proj} >= 0 THEN {2 ** j} ELSE 0 END")
    return F.expr(" + ".join(terms)).cast("int")


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane sign sketch (Charikar 2002 SimHash for angles).

    Bucket = packed sign bits, computed in the scan itself.  At 100 TB:
    one narrow scan, shuffle only on (bucket), skew bounded by
    2^n_planes buckets.
    """
    return embeddings.select(F.col(id_col), _bucket_col(vec_col, n_planes).alias("bucket"))


def cosine_topk_lsh(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket candidates, exact re-score.

    Recall is tunable via n_planes (fewer planes = bigger buckets =
    higher recall & cost).  Candidate join is bucket-equi — a hash
    shuffle, never a cross product.
    """
    # bucket is computed inline in the scan (no join-back shuffle); the
    # tiny query side is broadcast so candidates never shuffle at all
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col), _bucket_col(vec_col, n_planes).alias("bucket")
    )
    queries = vecs.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    cands = vecs.select(F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("cvec"), "bucket")
    dot = F.expr(_DOT.format(a="qvec", b="cvec"))
    qq = F.expr(_DOT.format(a="qvec", b="qvec"))
    cc = F.expr(_DOT.format(a="cvec", b="cvec"))
    scored = (
        cands.join(F.broadcast(queries), "bucket")
        .filter(F.col("query_id") != F.col("candidate_id"))
        .withColumn("cosine", F.round(dot / (F.sqrt(qq) * F.sqrt(cc)), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("candidate_id").asc())
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "candidate_id", "cosine", F.col("nn_rank").cast("int").alias("nn_rank"))
    )
