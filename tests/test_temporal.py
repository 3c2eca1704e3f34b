"""Tests for operators/temporal.py: gap sessionization and as-of join.

The `sessions` / `asof_clicks` oracle queries pin values vs DuckDB
(incl. native ASOF LEFT JOIN parity); these tests cover semantics the
oracle can't: tie handling, tolerance nulling, unmatched keys, numeric
ts columns, and determinism under repartitioning.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from validr_spark.operators.temporal import (asof_join, session_stats,
                                             sessionize)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap 30min at default 1800s splits >30)
        Row(user_id=1, ts=_ts(0)), Row(user_id=1, ts=_ts(10)),
        Row(user_id=1, ts=_ts(20)),
        Row(user_id=1, ts=_ts(120)), Row(user_id=1, ts=_ts(125)),
        # user 2: single event
        Row(user_id=2, ts=_ts(5)),
    ]
    return spark.createDataFrame(rows)


def test_sessionize_gap_splits(spark, events):
    s = sessionize(events, gap_seconds=1800)
    m = {(r.user_id, r.ts.minute + 60 * r.ts.hour): r.session_id
         for r in s.collect()}
    assert m[(1, 0)] == m[(1, 10)] == m[(1, 20)] == "1-1"
    assert m[(1, 120)] == m[(1, 125)] == "1-2"
    assert m[(2, 5)] == "2-1"


def test_sessionize_boundary_is_exclusive(spark):
    # gap exactly == gap_seconds stays in the SAME session (strict >)
    df = spark.createDataFrame([Row(user_id=1, ts=_ts(0)),
                                Row(user_id=1, ts=_ts(30))])
    s = sessionize(df, gap_seconds=1800)
    assert len({r.session_id for r in s.collect()}) == 1


def test_session_stats(spark, events):
    st = {r.session_id: r for r in session_stats(events).collect()}
    assert st["1-1"].n_events == 3
    assert st["1-1"].duration_sec == pytest.approx(1200.0)
    assert st["1-2"].n_events == 2
    assert st["2-1"].duration_sec == 0.0


def test_sessionize_numeric_ts(spark):
    df = spark.createDataFrame([Row(user_id=1, ts=0.0),
                                Row(user_id=1, ts=100.0),
                                Row(user_id=1, ts=5000.0)])
    s = sessionize(df, gap_seconds=1800)
    assert len({r.session_id for r in s.collect()}) == 2


def test_asof_join_basic_and_ties(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_ts(10), lid="a"),    # matches right at 5
        Row(k=1, ts=_ts(30), lid="b"),    # matches right at 30 (tie incl.)
        Row(k=1, ts=_ts(1), lid="c"),     # before any right: NULL
        Row(k=2, ts=_ts(10), lid="d"),    # key with no right rows: NULL
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=_ts(5), v=50),
        Row(k=1, ts=_ts(30), v=300),
    ])
    out = {r.lid: r for r in
           asof_join(left, right, on="k", ts_col="ts").collect()}
    assert out["a"].v_right == 50
    assert out["b"].v_right == 300          # equal-ts right row matches
    assert out["c"].v_right is None and out["c"].ts_right is None
    assert out["d"].v_right is None
    assert out["a"].ts_right == _ts(5)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(120), lid="x")])
    right = spark.createDataFrame([Row(k=1, ts=_ts(0), v=1)])
    near = asof_join(left, right, on="k", ts_col="ts").collect()[0]
    assert near.v_right == 1
    far = asof_join(left, right, on="k", ts_col="ts",
                    tolerance_seconds=3600).collect()[0]
    assert far.v_right is None and far.ts_right is None


def test_asof_join_row_count_preserved(spark):
    # one left row never fans out, however many right rows precede it
    left = spark.createDataFrame([Row(k=1, ts=_ts(100), lid="x")])
    right = spark.createDataFrame([Row(k=1, ts=_ts(i), v=i)
                                   for i in range(50)])
    out = asof_join(left, right, on="k", ts_col="ts")
    assert out.count() == 1
    assert out.collect()[0].v_right == 49   # latest preceding


def test_asof_join_deterministic_under_repartition(spark):
    left = spark.createDataFrame([Row(k=i % 5, ts=_ts(i), lid=str(i))
                                  for i in range(100)])
    right = spark.createDataFrame([Row(k=i % 5, ts=_ts(i), v=i)
                                   for i in range(0, 100, 7)])
    a = sorted((r.lid, r.v_right) for r in
               asof_join(left, right, on="k", ts_col="ts").collect())
    b = sorted((r.lid, r.v_right) for r in
               asof_join(left.repartition(13), right.repartition(3),
                         on="k", ts_col="ts").collect())
    assert a == b


def test_resample_gap_fill_hand_case(spark):
    from validr_spark.operators.temporal import resample
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 5.0, 3.0), ("a", 32.0, 1.0),
         ("b", 11.0, 4.0)],
        "k string, ts double, v double")
    rows = [(r["k"], r["bucket"], r["n_events"], r["sum_value"])
            for r in resample(df, "ts", 10, key_col="k",
                              value_col="v").collect()]
    assert rows == [
        ("a", 0, 2, 5.0),
        ("a", 10, 0, None),     # empty bucket: count 0, sum NULL
        ("a", 20, 0, None),
        ("a", 30, 1, 1.0),
        ("b", 10, 1, 4.0),
    ]


def test_resample_no_fill_and_no_key(spark):
    from validr_spark.operators.temporal import resample
    df = spark.createDataFrame([(1.0,), (25.0,)], "ts double")
    active = resample(df, "ts", 10, fill=False).collect()
    assert {(r["bucket"], r["n_events"]) for r in active} == {(0, 1), (20, 1)}
    filled = resample(df, "ts", 10).collect()
    assert [(r["bucket"], r["n_events"]) for r in filled] == [
        (0, 1), (10, 0), (20, 1)]


def test_resample_span_guard(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException
    from validr_spark.operators.temporal import resample
    df = spark.createDataFrame([("s", 0.0), ("s", 1e9)], "k string, ts double")
    with pytest.raises(SparkRuntimeException, match="exceeds"):
        resample(df, "ts", 1, key_col="k",
                 max_buckets_per_key=1000).collect()


def test_asof_forward_and_nearest(spark):
    from validr_spark.operators.temporal import asof_join
    left = spark.createDataFrame(
        [("u", 10.0), ("u", 25.0), ("u", 100.0)], "k string, ts double")
    right = spark.createDataFrame(
        [("u", 8.0, "a"), ("u", 12.0, "b"), ("u", 30.0, "c")],
        "k string, ts double, v string")

    back = {r["ts"]: r["v_right"] for r in
            asof_join(left, right, "k", "ts").collect()}
    assert back == {10.0: "a", 25.0: "b", 100.0: "c"}

    fwd = {r["ts"]: r["v_right"] for r in
           asof_join(left, right, "k", "ts",
                     direction="forward").collect()}
    # next right at-or-after: 10->12(b), 25->30(c), 100->none
    assert fwd == {10.0: "b", 25.0: "c", 100.0: None}

    near = {r["ts"]: r["v_right"] for r in
            asof_join(left, right, "k", "ts",
                      direction="nearest").collect()}
    # 10: back lag 2 == fwd lag 2 -> tie goes backward (a)
    # 25: back lag 13 vs fwd lag 5 -> c;  100: only back exists -> c
    assert near == {10.0: "a", 25.0: "c", 100.0: "c"}


def test_asof_forward_inclusive_tie_and_tolerance(spark):
    from validr_spark.operators.temporal import asof_join
    left = spark.createDataFrame([("u", 20.0)], "k string, ts double")
    right = spark.createDataFrame(
        [("u", 20.0, "exact"), ("u", 90.0, "far")],
        "k string, ts double, v string")
    r = asof_join(left, right, "k", "ts", direction="forward").collect()[0]
    assert r["v_right"] == "exact"          # ts == matches inclusively
    r2 = asof_join(left.withColumn("ts", F.col("ts") + 1), right, "k",
                   "ts", direction="forward",
                   tolerance_seconds=30).collect()[0]
    assert r2["v_right"] is None            # next is 69s away, > tolerance


def test_asof_nearest_matches_pandas_reference(spark):
    import pandas as pd
    from validr_spark.operators.temporal import asof_join
    import random
    rng = random.Random(3)
    lrows = sorted((rng.uniform(0, 100),) for _ in range(40))
    rrows = sorted((rng.uniform(0, 100),) for _ in range(25))
    left = spark.createDataFrame([("k", t) for (t,) in lrows],
                                 "k string, ts double")
    right = spark.createDataFrame(
        [("k", t, i) for i, (t,) in enumerate(rrows)],
        "k string, ts double, rid long")
    got = {r["ts"]: r["rid_right"] for r in
           asof_join(left, right, "k", "ts",
                     direction="nearest").collect()}
    pl = pd.DataFrame({"ts": [t for (t,) in lrows]})
    pr = pd.DataFrame({"ts": [t for (t,) in rrows],
                       "rid": range(len(rrows))})
    ref = pd.merge_asof(pl, pr, on="ts", direction="nearest")
    for t, rid in zip(ref["ts"], ref["rid"]):
        assert got[t] == rid
