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
