"""Streaming (and batch-plan) windowed category drift vs a static
baseline."""

import datetime

import pytest
from pyspark.sql import functions as F

from validr_spark.streaming.drift import windowed_category_drift


def _ts(minute, second=0):
    return datetime.datetime(2026, 1, 1, 10, minute, second)


def _mk_baseline(spark, pairs):
    return spark.createDataFrame(pairs, "category string, n long")


def _chi2_ref(obs: dict, base: dict) -> float:
    """Reference implementation: scaled-expected chi2 with 0.5 prior for
    unseen-in-baseline categories and zero-obs terms for unseen-in-window
    baseline categories."""
    tb = sum(base.values())
    T = sum(obs.values())
    cats = set(obs) | set(base)
    s = 0.0
    for c in cats:
        es = (base.get(c, 0.5 if c not in base else 0) or 0.5) / tb \
            if c not in base else base[c] / tb
        e = es * T
        o = obs.get(c, 0)
        s += (o - e) ** 2 / e
    return s


def test_batch_plan_matches_reference_math(spark):
    base = _mk_baseline(spark, [("a", 50), ("b", 30), ("c", 20)])
    rows = ([(_ts(0, i), "a") for i in range(5)]
            + [(_ts(0, 30 + i), "b") for i in range(3)]
            + [(_ts(0, 50), "z")]            # unseen in baseline
            )                                 # 'c' unseen in window
    df = spark.createDataFrame(rows, "ts timestamp, cat string")
    out = windowed_category_drift(df, base, "ts", "cat",
                                  window="10 minutes").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 9 and r["n_categories"] == 3
    want = _chi2_ref({"a": 5, "b": 3, "z": 1},
                     {"a": 50, "b": 30, "c": 20})
    assert r["chi2"] == pytest.approx(want, abs=1e-6)


def test_batch_no_drift_is_small(spark):
    base = _mk_baseline(spark, [("a", 500), ("b", 500)])
    rows = ([(_ts(0, i % 60), "a") for i in range(50)]
            + [(_ts(1, i % 60), "b") for i in range(50)])
    df = spark.createDataFrame(rows, "ts timestamp, cat string")
    r = windowed_category_drift(df, base, "ts", "cat",
                                window="10 minutes",
                                threshold=3.84).first()
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert r["drifted"] is False


def test_two_windows_scored_independently(spark):
    base = _mk_baseline(spark, [("a", 1), ("b", 1)])
    rows = ([(_ts(0), "a"), (_ts(1), "b")]          # balanced window
            + [(_ts(20, i % 60), "a") for i in range(10)])   # all-a window
    df = spark.createDataFrame(rows, "ts timestamp, cat string")
    out = {r["window_start"].minute: r["chi2"]
           for r in windowed_category_drift(
               df, base, "ts", "cat", window="10 minutes").collect()}
    assert out[0] == pytest.approx(0.0, abs=1e-9)
    # all-a: exp 5/5, obs 10/0 -> (10-5)^2/5 + 5 = 10
    assert out[20] == pytest.approx(10.0, abs=1e-6)


def test_streaming_availablenow(spark, tmp_path):
    base = _mk_baseline(spark, [("a", 1), ("b", 1)])
    rows = ([(_ts(0, i % 60), "a") for i in range(8)]
            + [(_ts(0, 10 + i % 40), "b") for i in range(2)]
            # second window far ahead so the watermark closes window 1
            + [(_ts(40), "a"), (_ts(41), "b")])
    df = spark.createDataFrame(rows, "ts timestamp, cat string")
    data = str(tmp_path / "in")
    df.coalesce(1).write.parquet(data)

    sdf = spark.readStream.schema(df.schema).parquet(data)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    scored = windowed_category_drift(sdf, base, "ts", "cat",
                                     window="10 minutes",
                                     watermark="1 minute")
    q = (scored.writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    # append mode emits only watermark-closed windows: window @10:00
    rows_out = got.collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r["n_rows"] == 10
    # exp 5/5, obs 8/2 -> (8-5)^2/5 + (2-5)^2/5 = 3.6
    assert r["chi2"] == pytest.approx(3.6, abs=1e-6)
