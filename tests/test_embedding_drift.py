"""Embedding moment drift (validr_spark/operators/embedding.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from validr_spark.operators.embedding import dim_moments, embedding_drift

DIM = 8


def _mk(spark, n, shift=None, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, DIM))
    if shift is not None:
        x[:, 2] += shift
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), x


def test_dim_moments_matches_numpy(spark):
    df, x = _mk(spark, 200)
    got = {r.pos: r for r in dim_moments(df).collect()}
    assert len(got) == DIM
    for p in range(DIM):
        assert got[p].n == 200
        assert got[p].mean == pytest.approx(x[:, p].mean(), abs=1e-9)
        assert got[p].var == pytest.approx(x[:, p].var(), abs=1e-9)


def test_no_drift_between_same_distribution(spark):
    a, _ = _mk(spark, 400, seed=1)
    b, _ = _mk(spark, 400, seed=2)
    r = embedding_drift(a, b).head()
    assert r.n_dims == DIM
    assert r.n_dims_shifted == 0
    assert r.n_a == 400 and r.n_b == 400


def test_shifted_dimension_detected(spark):
    a, _ = _mk(spark, 400, seed=3)
    b, _ = _mk(spark, 400, shift=1.0, seed=4)
    r = embedding_drift(a, b).head()
    assert r.n_dims_shifted == 1
    assert r.max_abs_z > 5
    assert 0.8 < r.mean_shift_l2 < 1.4


def test_null_embeddings_ignored(spark):
    a, _ = _mk(spark, 100, seed=5)
    with_null = a.unionByName(spark.createDataFrame(
        [(999, None)], "vec_id long, embedding array<double>"))
    assert dim_moments(with_null).head().n == 100
