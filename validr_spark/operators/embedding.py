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

__all__ = ["dim_moments", "embedding_drift", "embedding_hygiene"]


def embedding_hygiene(df: DataFrame, emb_col: str = "embedding",
                      dim: int | None = None,
                      by: str | None = None) -> DataFrame:
    """Corpus-level embedding sanity audit: one row (or one per ``by``
    group) counting vectors that would corrupt training or silently poison
    similarity search — NULL vectors, wrong dimensionality, NULL elements,
    NaN / ±Inf components, all-zero vectors (cosine is undefined on them).

    Pure Catalyst projection + one partial-aggregated pass: NaN/Inf
    detection is `array_contains` against the special-value literals
    (Spark's NaN-equals-NaN ordering semantics make this exact — no
    interpreted HOF, PERF.md Finding 1), zero vectors via array_min =
    array_max = 0, NULL elements via the array_compact size drop.  The
    shuffle carries |groups| rows; nothing row-shaped moves.

    ``dim``: expected dimensionality; default = the first non-null row's.
    """
    if dim is None:
        first = df.select(emb_col).filter(F.col(emb_col).isNotNull()).first()
        if first is None:
            raise ValueError("embedding_hygiene: no non-null embeddings; "
                             "pass dim= explicitly")
        dim = len(first[0])
    e = F.col(emb_col)
    et = [f.dataType.elementType.simpleString()
          for f in df.schema.fields if f.name == emb_col][0]
    nan = F.lit(float("nan")).cast(et)
    pinf = F.lit(float("inf")).cast(et)
    ninf = F.lit(float("-inf")).cast(et)
    is_null = e.isNull()
    wrong_dim = ~is_null & (F.size(e) != F.lit(dim))
    null_elem = ~is_null & (F.size(F.array_compact(e)) < F.size(e))
    has_nan = F.coalesce(F.array_contains(e, nan), F.lit(False))
    has_inf = F.coalesce(F.array_contains(e, pinf)
                         | F.array_contains(e, ninf), F.lit(False))
    zero_vec = (~is_null & (F.size(e) > 0)
                & (F.array_min(e) == 0) & (F.array_max(e) == 0))
    flags = {"null_vec": is_null, "wrong_dim": wrong_dim,
             "null_elem": null_elem, "nan": has_nan, "inf": has_inf,
             "zero_vec": zero_vec}
    keys = [by] if by else []
    any_bad = None
    for c in flags.values():
        any_bad = c if any_bad is None else (any_bad | c)
    tmp = df.select(*keys,
                    *[c.cast("long").alias(f"_{n}") for n, c in flags.items()],
                    (~any_bad).cast("long").alias("_clean"))
    g = tmp.groupBy(*keys) if keys else tmp.groupBy()
    out = g.agg(F.count(F.lit(1)).alias("n_rows"),
                *[F.sum(f"_{n}").alias(f"n_{n}") for n in flags],
                F.sum("_clean").alias("n_clean"))
    return out.orderBy(*keys) if keys else out


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
