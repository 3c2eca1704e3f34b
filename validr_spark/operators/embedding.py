"""Embedding-column drift: moment shift between two snapshots.

Completes the drift family (KS / chi² / PSI are scalar/categorical —
drift.py) for `array<float>` embedding columns: has the representation
moved between corpus versions / model versions / time windows?

Per-dimension first/second moments are computed with the same
scale shape as ``clustering.kmeans_fit``: ``mapInPandas`` per-partition
numpy partials (state = 2·dim+1 floats per partition, independent of row
count), combined by a tiny posexplode→groupBy over dim-sized rows —
only O(partitions · dim) floats ever shuffle, nothing row-shaped leaves
the executors.  The z-score per dimension is the two-sample mean test
``(μ_a − μ_b) / sqrt(σ²_a/n_a + σ²_b/n_b)`` (population variances).

No counterpart in guyskk/validr (no arrays-of-float semantics at all).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_moments", "embedding_drift"]


def dim_moments(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Per-dimension (pos, n, mean, var) via partition-local numpy
    partials; rows with NULL embeddings are ignored."""
    first = df.select(emb_col).filter(F.col(emb_col).isNotNull()).first()
    if first is None:
        raise ValueError("dim_moments: no non-null embeddings")
    dim = len(first[0])
    src = df.select(F.col(emb_col).alias("e")).filter(F.col("e").isNotNull())

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        ss = np.zeros(dim, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["e"]])
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += (x * x).sum(axis=0)
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "ss": [ss.tolist()]})

    part = src.mapInPandas(
        partials, "n long, s array<double>, ss array<double>")
    ex = part.select("n", F.posexplode(F.arrays_zip("s", "ss"))
                     .alias("pos", "z"))
    agg = (ex.groupBy("pos")
           .agg(F.sum(F.col("z.s")).alias("s"),
                F.sum(F.col("z.ss")).alias("ss"),
                F.sum("n").alias("n")))
    mean = F.col("s") / F.col("n")
    return agg.select(
        "pos", "n", mean.alias("mean"),
        (F.col("ss") / F.col("n") - mean * mean).alias("var"))


def embedding_drift(df_a: DataFrame, df_b: DataFrame,
                    emb_col: str = "embedding",
                    z_threshold: float = 3.0) -> DataFrame:
    """One-row drift summary between two embedding snapshots:
    (n_dims, n_dims_shifted, max_abs_z, mean_shift_l2, n_a, n_b).

    ``n_dims_shifted`` counts dimensions whose two-sample mean z-score
    exceeds ``z_threshold``; ``mean_shift_l2`` is ‖μ_a − μ_b‖₂."""
    a = dim_moments(df_a, emb_col)
    b = dim_moments(df_b, emb_col)
    j = (a.select("pos", F.col("n").alias("na"), F.col("mean").alias("ma"),
                  F.col("var").alias("va"))
         .join(b.select("pos", F.col("n").alias("nb"),
                        F.col("mean").alias("mb"),
                        F.col("var").alias("vb")), "pos"))
    se = F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
    z = F.when(se > 0, F.abs(F.col("ma") - F.col("mb")) / se) \
        .otherwise(F.lit(0.0))
    d = F.col("ma") - F.col("mb")
    return (j.select(z.alias("z"), (d * d).alias("d2"),
                     "na", "nb")
            .agg(F.count(F.lit(1)).alias("n_dims"),
                 F.sum(F.when(F.col("z") > z_threshold, 1)
                       .otherwise(0)).alias("n_dims_shifted"),
                 F.round(F.max("z"), 6).alias("max_abs_z"),
                 F.round(F.sqrt(F.sum("d2")), 6).alias("mean_shift_l2"),
                 F.max("na").alias("n_a"), F.max("nb").alias("n_b")))
