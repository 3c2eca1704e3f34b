"""Distributed spherical k-means (operators/clustering.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from validr_spark.operators.clustering import (
    cluster_sizes, kmeans_assign, kmeans_fit)


def _blob_df(spark, seed=7, n_per=60, dim=8):
    """Three well-separated unit-vector blobs around axis directions."""
    rng = np.random.default_rng(seed)
    centers = np.eye(dim)[:3]
    rows = []
    i = 0
    for ci, c in enumerate(centers):
        for _ in range(n_per):
            v = c + rng.normal(0, 0.05, dim)
            v = v / np.linalg.norm(v)
            rows.append((i, ci, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, true_cluster int, embedding array<double>")


def test_kmeans_recovers_blobs(spark):
    df = _blob_df(spark)
    cents, hist = kmeans_fit(df, k=3, iters=6, seed=1)
    assert cents.shape == (3, 8)
    # unit rows
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)
    # inertia non-increasing and small at convergence
    assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:]))
    assert hist[-1] < 0.01
    # each blob maps to exactly one distinct cell
    assigned = kmeans_assign(df, cents).select("true_cluster", "cluster")
    m = (assigned.groupBy("true_cluster")
         .agg(F.count_distinct("cluster").alias("k"),
              F.min("cluster").alias("c")).collect())
    assert all(r["k"] == 1 for r in m)
    assert len({r["c"] for r in m}) == 3


def test_kmeans_deterministic_across_partitioning(spark):
    df = _blob_df(spark)
    c1, h1 = kmeans_fit(df.repartition(1), k=3, iters=4, seed=1)
    c2, h2 = kmeans_fit(df.repartition(7), k=3, iters=4, seed=1)
    # identical init (hash sample) + exact partial sums -> same history
    # within float-reduction noise and same centroids up to tiny eps
    assert h1 == pytest.approx(h2, abs=1e-9)
    assert np.allclose(np.sort(c1, axis=0), np.sort(c2, axis=0), atol=1e-9)


def test_kmeans_empty_cell_respawn_and_sizes(spark):
    # 2 tight blobs but k=4: two cells must respawn; fit still completes
    df = _blob_df(spark, n_per=30)
    cents, hist = kmeans_fit(df, k=4, iters=5, seed=3)
    assert cents.shape[0] == 4
    sizes = {r["cluster"]: r["n"] for r in cluster_sizes(df, cents).collect()}
    assert sum(sizes.values()) == 90
    assert not math.isnan(hist[-1])


def test_kmeans_guards(spark):
    df = _blob_df(spark, n_per=2)  # 6 rows
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(df, k=50)
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, k=2)


def test_semantic_dedup_pairs(spark):
    from validr_spark.operators.clustering import semantic_dedup_pairs
    import numpy as np
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, 8)
    base /= np.linalg.norm(base)
    far = np.roll(base, 3) * -1.0
    rows = []
    # ids 0,1: near-identical; id 2: same cluster but distinct; id 3: far
    for i, eps in [(0, 0.0), (1, 0.01), (2, 0.6)]:
        v = base + eps * rng.normal(0, 1, 8)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    rows.append((3, [float(x) for x in far / np.linalg.norm(far)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_dedup_pairs(df, k=2, threshold=0.98, iters=2)
    got = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert got == [(0, 1)]
    # threshold sweep: relaxing pulls in the same-cluster distinct doc
    loose = semantic_dedup_pairs(df, k=2, threshold=0.2, iters=2)
    got2 = {(r["id_a"], r["id_b"]) for r in loose.collect()}
    assert (0, 1) in got2 and len(got2) >= 2
