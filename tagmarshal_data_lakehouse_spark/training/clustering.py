"""Distributed Lloyd's k-means over an embedding column.

The iterative-algorithm representative for the training-data surface
(corpus clustering for curation mixes, IVF coarse quantizers, topic
balancing).  Pure DataFrame ops — no MLlib VectorUDT round-trips, no
Python in the hot path:

- **assignment** is k codegen'd distance expressions against BROADCAST
  centroid literals (k*dim doubles — a few KB; the 100 TB side never
  shuffles for assignment);
- **update** is one hash aggregate per iteration: dimension-wise
  partial sums per cluster combine map-side, so the shuffle carries at
  most k*dim partials per task, independent of row count;
- the driver loop touches only the k*dim centroid matrix per iteration
  (the classic treeAggregate shape, spelled as a DataFrame groupBy).

Initialization is deterministic (k lowest xxhash64(id) rows), so runs
are reproducible across partitionings and retries — same contract as
the registry's other deterministic-by-construction operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist_sql(vec_col: str, centroid: list[float]) -> str:
    """Codegen'd squared L2 distance between an array column and a
    centroid literal (zip_with + aggregate stay inside whole-stage
    codegen; no UDF, no serialization).

    Built as ONE SQL string (r13 optimization pass — driver-side build
    cost: the Column form issued k·dim py4j literal calls PER LLOYD'S
    ITERATION). Each component is spelled CAST('<repr>' AS DOUBLE):
    Java's parseDouble of Python's repr is the exact round-trip double,
    and ConstantFolding collapses the casts to the same literals
    F.lit(float) produced — bit-identical distances.
    """
    vals = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in centroid)
    return (
        f"aggregate(zip_with(`{vec_col}`, array({vals}), "
        f"(a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _sq_dist(vec_col: str, centroid: list[float]) -> F.Column:
    """Column twin of `_sq_dist_sql` (kept for expression composition)."""
    return F.expr(_sq_dist_sql(vec_col, centroid))


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add `cluster` (0-based argmin centroid) and `sq_dist` columns.

    One row-local projection: k distance expressions + argmin via
    array_position on the distance array.  Ties break to the lowest
    cluster index (array_position returns the first match), keeping
    assignment deterministic.  Construction is one parsed SQL string
    per stage (see `_sq_dist_sql`) — the expression trees, and so the
    assignment, are identical to the former Column-API form.
    """
    dists = "array(" + ", ".join(_sq_dist_sql(vec_col, c) for c in centroids) + ")"
    return (
        df.selectExpr("*", f"{dists} AS _dists")
        .selectExpr("*", "array_min(_dists) AS sq_dist")
        .selectExpr("*", "CAST(array_position(_dists, sq_dist) - 1 AS INT) AS cluster")
        .drop("_dists")
    )


def assign_clusters_multiprobe(
    df: DataFrame,
    centroids: list[list[float]],
    n_probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per (vector, probe): the `n_probes` nearest centroids
    per vector, with `probe_rank` 1..n_probes (rank 1 == the argmin
    cluster `assign_clusters` returns, ties to the lowest index — so
    the primary assignment is identical by construction).

    The ANN multi-probe idea applied to clustered dedup: a vector near
    a Voronoi boundary gets scored in its runner-up cluster(s) too, so
    near-dup pairs that straddle the boundary — the recall SemDeDup
    gives up by design — are caught when the pair shares ANY probe
    cluster.  Still row-local and codegen'd (distance array -> sort by
    (dist, index) -> slice -> explode): the 100 TB side never shuffles
    for assignment, and downstream per-cluster cost scales by <=
    n_probes per vector (pair mass by <= n_probes^2).
    """
    k = len(centroids)
    n_probes = max(1, min(n_probes, k))
    dists = F.expr(
        "array(" + ", ".join(_sq_dist_sql(vec_col, c) for c in centroids) + ")"
    )
    ranked = F.expr(
        f"""slice(array_sort(
                arrays_zip(_dists, sequence(0, {k - 1})),
                (l, r) -> CASE WHEN l._dists < r._dists THEN -1
                               WHEN l._dists > r._dists THEN 1
                               WHEN l.`1` < r.`1` THEN -1
                               WHEN l.`1` > r.`1` THEN 1
                               ELSE 0 END
            ), 1, {n_probes})"""
    )
    return (
        df.withColumn("_dists", dists)
        .withColumn("_probes", ranked)
        .select(
            F.col(id_col),
            F.posexplode("_probes").alias("_pos", "_probe"),
        )
        .select(
            F.col(id_col),
            F.col("_probe.`1`").cast("int").alias("cluster"),
            F.round(F.col("_probe._dists"), 6).alias("sq_dist"),
            (F.col("_pos") + 1).cast("int").alias("probe_rank"),
        )
    )


def init_centroids(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
) -> list[list[float]]:
    """Deterministic farthest-point seeding over a hash-ordered sample.

    One distributed job: take the `sample_size` rows with the smallest
    xxhash64(id) — a uniform pseudo-random subset every run, partitioning,
    and retry agrees on (rand()-based sampling breaks reproducibility
    under task retry).  Greedy farthest-point then runs driver-side on
    the tiny sample: start from the lowest-hash point, repeatedly add
    the sample point farthest from its nearest chosen centroid (ties to
    the lowest index).  This is the deterministic cousin of k-means++ —
    it cannot seed two centroids inside one tight cluster, the failure
    mode that leaves plain hash-order init with empty clusters.
    """
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(max(sample_size, k))
        .collect()
    )
    pts = [list(map(float, r["v"])) for r in rows]
    if len(pts) <= k:
        return pts

    def sq(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [pts[0]]
    nearest = [sq(p, pts[0]) for p in pts]
    while len(chosen) < k:
        far = max(range(len(pts)), key=lambda i: (nearest[i], -i))
        chosen.append(pts[far])
        nearest = [min(nearest[i], sq(pts[i], pts[far])) for i in range(len(pts))]
    return chosen


def kmeans(
    df: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_sizes: bool = False,
) -> tuple:
    """Lloyd's iterations until centroid shift < `tol` or `max_iter`.

    Returns (assignments, centroids): assignments has (id, cluster,
    sq_dist) per input row; centroids is the final k x dim matrix.
    With `return_sizes=True`, also returns the {cluster: count}
    histogram from the LAST update aggregate — a free by-product of
    the fit (the k-row collect each iteration already carries COUNT).
    Note the histogram describes the assignment that PRODUCED the
    final centroids, one half-step behind the returned assignment
    frame — exact enough for cost decisions (scorer routing, cluster
    rebalancing alarms) at zero extra jobs; consumers needing the
    post-update histogram aggregate the assignment frame instead.

    Each iteration runs ONE distributed job: assignment (row-local) ->
    groupBy(cluster) with dim partial SUMs + COUNT (map-side combine) ->
    k-row collect.  Empty clusters keep their previous centroid (the
    deterministic-init hash seeding makes them rare in practice).

    The fit's (id, vec) projection is persisted for the LOOP only (r13
    optimization pass, guide §5: an iterative fit re-reads the same
    frame max_iter+2 times — the canonical cache case; at 100 TB that
    is max_iter full scans of the embedding table). Every job that
    touches the cache (dim probe, init sample, per-iteration updates)
    completes INSIDE this function, so the cache is unpersisted before
    returning and nothing leaks; the returned assignment frame is built
    over the caller's original `df`, exactly as before.
    """
    from pyspark import StorageLevel

    fit_frame = df.select(F.col(id_col), F.col(vec_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        dim = len(fit_frame.select(vec_col).first()[0])
        centroids = init_centroids(fit_frame, k, id_col, vec_col)

        sizes: dict[int, int] = {}
        for _ in range(max_iter):
            assigned = assign_clusters(fit_frame, centroids, vec_col)
            sums = (
                assigned.groupBy("cluster")
                .agg(
                    *[
                        F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}")
                        for i in range(dim)
                    ],
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            sizes = {row["cluster"]: row["n"] for row in sums}
            new_centroids = list(centroids)  # empty clusters keep previous position
            shift = 0.0
            for row in sums:
                c = row["cluster"]
                centroid = [row[f"s{i}"] / row["n"] for i in range(dim)]
                shift = max(
                    shift,
                    sum((a - b) * (a - b) for a, b in zip(centroid, centroids[c])),
                )
                new_centroids[c] = centroid
            centroids = new_centroids
            if shift < tol:
                break
    finally:
        fit_frame.unpersist()

    out = assign_clusters(df, centroids, vec_col).select(
        F.col(id_col),
        F.col("cluster"),
        F.round(F.col("sq_dist"), 6).alias("sq_dist"),
    )
    if return_sizes:
        return out, centroids, sizes
    return out, centroids


def kmeans_assignments(
    df: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Registry-facing wrapper: just the assignment frame."""
    return kmeans(df, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col)[0]
