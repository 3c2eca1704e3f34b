"""Distributed spherical k-means over an embedding column — the trainer
for IVF coarse quantizers (operators/similarity.ivf_topk) and for
cluster-based corpus curation (SemDeDup-style semantic dedup buckets).

Lloyd's iterations in the classic large-scale shape:

* **Assign** — centroids broadcast to every task; nearest-centroid id via
  one Arrow-batched numpy matmul (`similarity.ivf_assign_col`) — a narrow
  projection, no shuffle.
* **Partial-reduce** — `mapInPandas` folds each partition's batches into
  per-(partition, cell) running sums: k×dim floats of state per task,
  independent of row count.
* **Combine** — the partials (≤ partitions × k rows) are posexploded to
  (cell, pos, val) and hash-aggregated; only k×dim aggregated floats ever
  reach the driver, never row-shaped data.

Per iteration: one scan + one tiny shuffle (partials only).  Empty cells
respawn deterministically from the heaviest cell's centroid with a tiny
index-dependent nudge (the standard k-means empty-cluster fix, made
reproducible).  Spherical variant: vectors and centroids live on the unit
sphere, so argmax-dot == nearest-cosine, matching every other embedding
operator in this package.

No counterpart in guyskk/validr (single-value validation only).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validr_spark.operators.similarity import ivf_assign_col, ivf_centroids

__all__ = ["kmeans_fit", "kmeans_assign", "cluster_sizes",
           "semantic_dedup_pairs"]


def _partial_sums_schema(dim: int) -> str:
    return "cell int, n long, s array<double>, inertia double"


def kmeans_fit(df: DataFrame, k: int = 64, iters: int = 5,
               id_col: str = "vec_id", emb_col: str = "embedding",
               seed: int = 42, tol: float = 1e-6, init=None):
    """Fit k spherical-k-means centroids; returns ``(centroids, history)``
    where centroids is a unit-row (k, dim) ndarray and history the mean
    cosine distance (1 − cos) per iteration — non-increasing to within
    ``tol`` by convexity; iteration stops early when it plateaus.

    Init = deterministic hash-sample (`ivf_centroids`), so the whole fit
    is reproducible on any cluster size / partitioning.  Pass ``init``
    (a (k, dim) array-like; rows are unit-normalized here) to pin the
    starting centroids explicitly — e.g. to SQL-recomputable vectors so
    an external engine can replay the whole fit (the kmeans_clusters
    oracle seeds with the first k embeddings by id for exactly this).
    """
    first = df.select(emb_col).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = len(first[0])
    if init is not None:
        cents = np.ascontiguousarray(init, dtype=np.float64)
        if cents.shape != (k, dim):
            raise ValueError(f"kmeans_fit: init shape {cents.shape} != "
                             f"({k}, {dim})")
        nrm = np.linalg.norm(cents, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        cents = cents / nrm
    else:
        cents = np.ascontiguousarray(
            ivf_centroids(df, k, id_col, emb_col, seed), dtype=np.float64)
    if cents.shape[0] < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds distinct sampled rows "
            f"({cents.shape[0]})")

    src = df.select(F.col(emb_col).alias("e"))
    history: list[float] = []
    for _ in range(iters):
        c = cents  # bind current value for the closure

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sums = np.zeros((k, dim), dtype=np.float64)
            cnts = np.zeros(k, dtype=np.int64)
            inert = np.zeros(k, dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack([np.asarray(v, dtype=np.float64)
                              for v in pdf["e"]])
                # non-finite vectors (failed encoder output) must not
                # vote: a single NaN would propagate into the centroid
                # sums AND null the inertia aggregate (pandas→Arrow maps
                # NaN to NULL), crashing the combine step
                finite = np.isfinite(x).all(axis=1)
                if not finite.all():
                    x = x[finite]
                    if not len(x):
                        continue
                nrm = np.linalg.norm(x, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                x = x / nrm
                sims = x @ c.T
                a = np.argmax(sims, axis=1)
                np.add.at(sums, a, x)
                np.add.at(cnts, a, 1)
                np.add.at(inert, a, 1.0 - sims[np.arange(len(a)), a])
            live = np.nonzero(cnts)[0]
            if not len(live):
                # empty partition: yield NOTHING — an empty frame's "s"
                # column materializes as a float64 ndarray and Arrow
                # refuses ndarray→list<double> (crashes the whole fit on
                # any input with an empty partition)
                return
            yield pd.DataFrame({
                "cell": live.astype("int32"),
                "n": cnts[live],
                "s": pd.Series([sums[i] for i in live], dtype=object),
                "inertia": inert[live]})

        part = src.mapInPandas(partials, schema=_partial_sums_schema(dim))
        agg = (part.select("cell", "n", "inertia",
                           F.posexplode("s").alias("pos", "v"))
               .groupBy("cell", "pos")
               .agg(F.sum("v").alias("sv"),
                    F.sum(F.when(F.col("pos") == 0, F.col("n"))
                          ).alias("_n"),
                    F.sum(F.when(F.col("pos") == 0, F.col("inertia"))
                          ).alias("_i"))
               .collect())

        sums = np.zeros((k, dim), dtype=np.float64)
        cnts = np.zeros(k, dtype=np.int64)
        tot_inertia = 0.0
        for r in agg:
            sums[r["cell"], r["pos"]] = r["sv"]
            if r["pos"] == 0:
                cnts[r["cell"]] = r["_n"]
                tot_inertia += r["_i"]
        n_rows = int(cnts.sum())
        history.append(tot_inertia / max(n_rows, 1))

        new = np.array(cents)
        live = cnts > 0
        means = sums[live] / cnts[live, None]
        nrm = np.linalg.norm(means, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        new[live] = means / nrm
        # deterministic empty-cell respawn: nudge off the heaviest cell
        empties = np.nonzero(~live)[0]
        if len(empties):
            heavy = int(np.argmax(cnts))
            for j, cell in enumerate(empties):
                v = np.array(new[heavy])
                v[(cell + j) % dim] += 1e-3 * (j + 1)
                new[cell] = v / np.linalg.norm(v)
        if len(history) >= 2 and history[-2] - history[-1] < tol:
            cents = new
            break
        cents = new
    return cents, history


def kmeans_assign(df: DataFrame, centroids,
                  emb_col: str = "embedding",
                  out_col: str = "cluster") -> DataFrame:
    """Attach the nearest-centroid cluster id — one narrow Arrow-batched
    projection; persist + partition/bucket by it for IVF pruning."""
    return df.withColumn(out_col, ivf_assign_col(F.col(emb_col), centroids))


def cluster_sizes(df: DataFrame, centroids,
                  emb_col: str = "embedding") -> DataFrame:
    """(cluster, n) histogram of the fitted assignment — the balance
    check before relying on cluster pruning (one hash aggregate)."""
    return (kmeans_assign(df, centroids, emb_col)
            .groupBy("cluster").agg(F.count(F.lit(1)).alias("n")))


def semantic_dedup_pairs(df: DataFrame, centroids=None, k: int = 64,
                         threshold: float = 0.95, iters: int = 2,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding") -> DataFrame:
    """SemDeDup-shaped semantic near-duplicate pairs: cluster first, then
    compare embeddings ONLY within a cluster (Abbas et al. 2023's recipe
    — the cluster assignment caps the all-pairs blowup at
    Σ|cell|² instead of N²).

    Returns (id_a, id_b, cosine) with id_a < id_b and cosine ≥ threshold
    — feed into graph.dedup_by_components to keep one doc per semantic
    group.  The pairwise cosine is a fully-codegen unrolled product sum
    (no interpreted HOFs, PERF.md Finding 1); the join is co-partitioned
    on the cluster id.  For very hot cells, refit with larger k (the
    cluster-size histogram from `cluster_sizes` is the pre-flight).

    Norms are precomputed ONCE per row before the join (like
    similarity.all_pairs_above): computing them per PAIR is O(|cell|²·dim)
    redundant work and, worse, the 3·dim-term post-join expression blows
    Janino's 64 KB method limit at dim=64 — Spark silently falls back to
    interpreted eval for the whole join stage.  Post-join it's dot/(na·nb),
    dim terms, comfortably inside codegen.
    """
    from validr_spark.operators.similarity import (_dot_unrolled,
                                                   _norm_unrolled)

    first = df.select(emb_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], f"id_a long, id_b long, cosine double")
    dim = len(first[0])
    if centroids is None:
        centroids, _ = kmeans_fit(df, k=k, iters=iters,
                                  id_col=id_col, emb_col=emb_col)
    celled = kmeans_assign(df, centroids, emb_col).select(
        F.col(id_col).alias("_id"), F.col(emb_col).alias("_e"),
        _norm_unrolled(F.col(emb_col), dim).alias("_n"), "cluster")
    a = celled.select(F.col("_id").alias("id_a"),
                      F.col("_e").alias("_ea"),
                      F.col("_n").alias("_na"), "cluster")
    b = celled.select(F.col("_id").alias("id_b"),
                      F.col("_e").alias("_eb"),
                      F.col("_n").alias("_nb"), "cluster")
    # try_divide + isnan: zero-norm rows yield NULL (not an ANSI abort),
    # and a NaN component can't pass the >= filter (NaN compares greater
    # than everything in Spark) and merge unrelated docs — same guards as
    # similarity.all_pairs_above / knn_join.
    cos = F.try_divide(_dot_unrolled(F.col("_ea"), F.col("_eb"), dim),
                       F.col("_na") * F.col("_nb"))
    return (a.join(b, "cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(cos, 9).alias("cosine"))
            .filter(F.col("cosine").isNotNull() & ~F.isnan("cosine")
                    & (F.col("cosine") >= threshold)))
