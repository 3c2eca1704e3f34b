"""numeric_correlations (operators/stats.py): pairwise Pearson corr +
sample covariance in one aggregation pass."""

import math
import statistics

import pytest

from validr_spark.operators.stats import numeric_correlations


def test_hand_math(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)],
        "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): (r["corr"], r["covar"])
           for r in numeric_correlations(df, ["x", "y", "z"]).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert out[("x", "y")][0] == pytest.approx(1.0)      # y = 2x
    assert out[("x", "y")][1] == pytest.approx(2.0)      # cov(x, 2x) = 2·var(x)
    assert out[("x", "z")][0] == pytest.approx(-1.0)     # z = 4 - x
    assert out[("x", "z")][1] == pytest.approx(-1.0)


def test_pairwise_null_exclusion_matches_python(spark):
    rows = [(1.0, 10.0), (2.0, None), (3.0, 9.0), (None, 7.0),
            (5.0, 2.0), (6.0, 1.5)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = numeric_correlations(df, ["a", "b"]).first()
    xs, ys = zip(*[(a, b) for a, b in rows if a is not None and b is not None])
    assert r["corr"] == pytest.approx(statistics.correlation(xs, ys))
    assert r["covar"] == pytest.approx(statistics.covariance(xs, ys))


def test_constant_column_corr_is_null(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)],
                               "a double, b double")
    r = numeric_correlations(df, ["a", "b"]).first()
    assert r["corr"] is None or math.isnan(r["corr"])
    assert r["covar"] == pytest.approx(0.0)


def test_single_pass_plan(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0)], "a double, b double, c double, d double")
    plan = (numeric_correlations(df, ["a", "b", "c", "d"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    # all 6 pairs ride one aggregate: exactly one shuffle boundary
    assert plan.count("Exchange") <= 1


def test_arg_guard(spark):
    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError, match=">= 2"):
        numeric_correlations(df, ["a"])
