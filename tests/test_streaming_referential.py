"""Stream-static referential checks (validr_spark/streaming/referential.py)."""
import datetime

import pytest

from validr_spark.streaming.referential import (stream_orphans,
                                                windowed_orphan_counts)


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 10, minute)


@pytest.fixture()
def fact_stream(spark, tmp_path):
    rows = [
        ("a", "web", _ts(0)),
        ("b", "books", _ts(1)),
        ("c", "spam", _ts(2)),       # orphan
        ("d", "web", _ts(3)),
        ("e", "junk", _ts(10)),      # orphan, later window
        # far-ahead non-orphan sentinel: advances the watermark so the
        # earlier windows close and emit in append mode
        ("f", "web", _ts(40)),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, ts timestamp")
    data = str(tmp_path / "facts")
    df.coalesce(1).write.parquet(data)
    return spark.readStream.schema(df.schema).parquet(data)


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [("web",), ("books",), ("code",)], "source string")


def _run(sdf, spark, name, mode="append"):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_orphans_matches_batch(spark, fact_stream, dim, tmp_path):
    out = _run(stream_orphans(fact_stream, dim, on="source"),
               spark, "ref_t1")
    assert sorted(r.doc_id for r in out.collect()) == ["c", "e"]
    # batch twin on the same files agrees
    from validr_spark.operators.referential import orphans
    batch = spark.read.parquet(str(tmp_path / "facts"))
    assert sorted(r.doc_id for r in orphans(batch, dim, "source").collect()) \
        == ["c", "e"]


def test_stream_orphans_is_stateless_join(spark, fact_stream, dim):
    sdf = stream_orphans(fact_stream, dim, on="source")
    # append mode works (a stateful/unsupported op would raise at start)
    # and the micro-batch carries no join state operators
    q = (sdf.writeStream.format("memory").queryName("ref_plan")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    last = q.lastProgress
    assert last is None or not last.get("stateOperators")


def test_windowed_orphan_counts(spark, fact_stream, dim):
    out = _run(windowed_orphan_counts(fact_stream, dim, on="source",
                                      ts_col="ts", window="5 minutes",
                                      watermark="0 seconds"),
               spark, "ref_t2")
    got = {(r.window_start.minute, r.n_orphans) for r in out.collect()}
    assert got == {(0, 1), (10, 1)}
