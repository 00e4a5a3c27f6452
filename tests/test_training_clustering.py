"""Distributed k-means: determinism, convergence, and recovery of the
planted label structure in the synthetic embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.training import clustering


@pytest.fixture(scope="module")
def embs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/embeddings.parquet").cache()


def test_kmeans_deterministic(embs):
    a, ca = clustering.kmeans(embs, k=5, max_iter=3)
    b, cb = clustering.kmeans(embs, k=5, max_iter=3)
    assert ca == cb  # hash-seeded init + exact same iteration path
    ra = {r["vec_id"]: r["cluster"] for r in a.collect()}
    rb = {r["vec_id"]: r["cluster"] for r in b.collect()}
    assert ra == rb


def test_kmeans_assignment_shape(embs):
    out, centroids = clustering.kmeans(embs, k=4, max_iter=2)
    assert len(centroids) == 4 and all(len(c) == 64 for c in centroids)
    rows = out.collect()
    assert len(rows) == embs.count()
    assert all(0 <= r["cluster"] < 4 for r in rows)
    assert all(r["sq_dist"] >= 0 for r in rows)


def test_kmeans_iterations_reduce_inertia(embs):
    one, _ = clustering.kmeans(embs, k=8, max_iter=1)
    many, _ = clustering.kmeans(embs, k=8, max_iter=6)
    inertia_1 = one.agg(F.sum("sq_dist")).first()[0]
    inertia_6 = many.agg(F.sum("sq_dist")).first()[0]
    assert inertia_6 <= inertia_1 + 1e-9  # Lloyd's monotonically improves


def test_kmeans_recovers_planted_clusters(spark):
    # the parquet embeddings are label-independent random vectors (no
    # planted structure — verified), so recovery is tested on explicit
    # well-separated clusters: 4 distant anchors + tight noise around each
    def jitter(seed):
        x = (1103515245 * seed + 12345) % 2**31
        return (x / 2**31 - 0.5) * 0.1

    anchors = [[10.0, 0.0], [0.0, 10.0], [-10.0, 0.0], [0.0, -10.0]]
    rows = []
    for i in range(80):
        a = anchors[i % 4]
        rows.append((i, [a[0] + jitter(i), a[1] + jitter(i + 7)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, centroids = clustering.kmeans(df, k=4, max_iter=10)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    # every member of a planted group lands in the same cluster, and the
    # four groups land in four distinct clusters
    groups = {g: {got[i] for i in range(80) if i % 4 == g} for g in range(4)}
    assert all(len(s) == 1 for s in groups.values()), groups
    assert len({next(iter(s)) for s in groups.values()}) == 4


def test_assign_clusters_ties_break_low_index(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<double>")
    # two identical centroids -> argmin must pick index 0
    out = clustering.assign_clusters(df, [[0.0, 0.0], [0.0, 0.0]]).first()
    assert out["cluster"] == 0


def _canon(rows):
    import math

    def cv(x):
        if isinstance(x, float) and math.isnan(x):
            return "NaN"
        if isinstance(x, list):
            return tuple(cv(e) for e in x)
        return x

    return sorted((tuple(cv(x) for x in r) for r in rows), key=repr)


def test_assign_clusters_gemm_twin_parity(embs):
    """r14: the Arrow/GEMM assignment twin must be bit-identical to the
    expression path — cluster AND sq_dist — on real data (the one-sided
    confident-gap routing falls back to the exact expression whenever
    the GEMM cannot prove the fold argmin)."""
    cents = clustering.init_centroids(embs, 10)
    a = clustering.assign_clusters(embs, cents, use_gemm=False).collect()
    b = clustering.assign_clusters(embs, cents, use_gemm=True).collect()
    assert _canon(a) == _canon(b)
    ma = clustering.assign_clusters_multiprobe(embs, cents, 3, use_gemm=False).collect()
    mb = clustering.assign_clusters_multiprobe(embs, cents, 3, use_gemm=True).collect()
    assert _canon(ma) == _canon(mb)


def test_assign_clusters_gemm_twin_edge_parity(spark):
    """r14: NULL vectors, ragged lengths, NaN components, exact ties
    against duplicate centroids — every adversarial row must route to
    the exact expression fallback and reproduce its output exactly."""
    rows = [
        (1, [0.0] * 64),
        (2, None),
        (3, [1.0, 2.0]),
        (4, [float("nan")] * 64),
        (5, [0.5] * 64),
    ]
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0] * 64, [1.0] * 64, [0.0] * 64]  # duplicate centroid => tie
    a = clustering.assign_clusters(edf, cents, use_gemm=False).collect()
    b = clustering.assign_clusters(edf, cents, use_gemm=True).collect()
    assert _canon(a) == _canon(b)
    # the tie must break to the LOWEST index on both paths
    assert all(r["cluster"] == 0 for r in b if r["vec_id"] in (1, 5))
    pa = clustering.assign_clusters_multiprobe(edf, cents, 2, use_gemm=False).collect()
    pb = clustering.assign_clusters_multiprobe(edf, cents, 2, use_gemm=True).collect()
    assert _canon(pa) == _canon(pb)
