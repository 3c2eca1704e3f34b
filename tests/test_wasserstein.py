"""wasserstein1 — earth mover's drift via the quantile-function form."""

from __future__ import annotations

import random

import pytest

from validr_spark.operators.drift import wasserstein1


def _df(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_identical_distributions_zero(spark):
    xs = [random.Random(1).gauss(0, 1) for _ in range(500)]
    a, b = _df(spark, xs), _df(spark, xs)
    row = wasserstein1(a, b, "v", grid=50, exact=True).first()
    assert row["w1"] == 0.0
    assert row["n_a"] == row["n_b"] == 500


def test_pure_shift_equals_shift(spark):
    """Qb(u) = Qa(u) + c for all u ⇒ W1 = c exactly, at any grid."""
    rng = random.Random(7)
    xs = [rng.gauss(0, 3) for _ in range(400)]
    a = _df(spark, xs)
    b = _df(spark, [x + 2.5 for x in xs])
    row = wasserstein1(a, b, "v", grid=20, exact=True).first()
    assert row["w1"] == pytest.approx(2.5, abs=1e-9)


def test_matches_python_reference_on_grid(spark):
    """Exact mode reproduces a midpoint-rule reference using the same
    linear-interpolation quantile definition."""
    rng = random.Random(3)
    xs = sorted(rng.uniform(0, 10) for _ in range(97))
    ys = sorted(rng.expovariate(0.4) for _ in range(53))

    def q(sorted_v, p):                      # percentile/quantile_cont
        h = (len(sorted_v) - 1) * p
        lo = int(h)
        hi = min(lo + 1, len(sorted_v) - 1)
        return sorted_v[lo] + (h - lo) * (sorted_v[hi] - sorted_v[lo])

    grid = 40
    ref = sum(abs(q(xs, (i + 0.5) / grid) - q(ys, (i + 0.5) / grid))
              for i in range(grid)) / grid
    row = wasserstein1(_df(spark, xs), _df(spark, ys), "v",
                       grid=grid, exact=True).first()
    assert row["w1"] == pytest.approx(round(ref, 6), abs=1e-6)


def test_approx_close_to_exact(spark):
    rng = random.Random(11)
    xs = [rng.gauss(5, 2) for _ in range(3000)]
    ys = [rng.gauss(6, 2) for _ in range(3000)]
    a, b = _df(spark, xs), _df(spark, ys)
    e = wasserstein1(a, b, "v", grid=50, exact=True).first()["w1"]
    s = wasserstein1(a, b, "v", grid=50).first()["w1"]
    assert s == pytest.approx(e, rel=0.05)
    assert 0.7 < e < 1.3                      # true shift is 1.0


def test_nulls_ignored(spark):
    a = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    b = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    row = wasserstein1(a, b, "v", grid=10, exact=True).first()
    assert row["w1"] == 0.0
    assert row["n_a"] == 2 and row["n_b"] == 2


def test_empty_side_keeps_counts(spark):
    a = spark.createDataFrame([], "v double")
    b = _df(spark, [1.0, 2.0])
    row = wasserstein1(a, b, "v", grid=10, exact=True).first()
    assert row["w1"] is None           # honest: no distribution to compare
    assert row["n_a"] == 0 and row["n_b"] == 2
