"""Streaming dedup: dropDuplicatesWithinWatermark keeps one row per
fingerprint; windowed duplicate monitor counts copies."""
import datetime

import pytest
from pyspark.sql import functions as F

from validr_spark.streaming.dedup import (dedup_stream,
                                          duplicate_counts_stream,
                                          with_fingerprint)


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 10, minute)


@pytest.fixture()
def doc_stream(spark, tmp_path):
    rows = [
        ("a", "hello  world", _ts(0)),
        ("b", "unique one", _ts(1)),
        ("c", "HELLO WORLD", _ts(2)),     # same normalized fingerprint as a
        ("d", "hello world", _ts(3)),     # dup again
        ("e", "unique two", _ts(4)),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, ts timestamp")
    data = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(data)
    return spark.readStream.schema(df.schema).parquet(data)


def _run(sdf, spark, name, mode="append"):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def test_dedup_stream_keeps_one_per_fingerprint(spark, doc_stream):
    out = _run(dedup_stream(with_fingerprint(doc_stream),
                            watermark="30 minutes"),
               spark, "dedup_t1")
    rows = out.collect()
    # a/c/d collapse to one survivor; b and e unique -> 3 rows
    assert len(rows) == 3
    fps = [r["fingerprint"] for r in rows]
    assert len(set(fps)) == 3
    assert {r["doc_id"] for r in rows} & {"a", "c", "d"} != set()
    assert {"b", "e"} <= {r["doc_id"] for r in rows}


def test_dedup_stream_matches_batch_exact_dedup(spark, doc_stream, tmp_path):
    from validr_spark.operators.dedup import exact_dedup
    batch = spark.read.parquet(str(tmp_path / "docs"))
    batch_kept = exact_dedup(batch, text_col="text", id_col="doc_id")
    stream_kept = _run(dedup_stream(with_fingerprint(doc_stream),
                                    watermark="30 minutes"),
                       spark, "dedup_t2")
    # same number of survivors, same set of fingerprints
    assert stream_kept.count() == batch_kept.count()


def test_duplicate_counts_stream(spark, doc_stream):
    # complete mode: with availableNow the watermark never passes the
    # window end within one trigger, so append would emit nothing here.
    out = _run(duplicate_counts_stream(with_fingerprint(doc_stream),
                                       window="10 minutes",
                                       watermark="30 minutes"),
               spark, "dupmon_t", mode="complete")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n_copies"] == 3


def test_stream_plan_is_stateful_dedup(spark, doc_stream):
    sdf = dedup_stream(with_fingerprint(doc_stream), watermark="10 minutes")
    assert sdf.isStreaming
    # fingerprints computed JVM-side (xxhash64), no Python UDF in the plan
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan.lower()
    assert "pythonudf" not in plan.lower()
