"""Bucketed-table sink: co-located joins without exchanges
(validr_spark/sources/tables.py write_bucketed)."""

import pytest
from pyspark.sql import functions as F

from validr_spark.sources import write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000, 3000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bt_a", "k", num_buckets=8, sort_by="k",
                   path=str(tmp_path / "a"))
    write_bucketed(b, "bt_b", "k", num_buckets=8, sort_by="k",
                   path=str(tmp_path / "b"))
    yield spark.table("bt_a"), spark.table("bt_b")
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    j = ta.hint("merge").join(tb, "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan          # co-located: no shuffle at all
    assert j.count() == 1000               # keys 1000..1999 overlap


def test_bucketed_join_values_match_unbucketed(spark, bucketed_pair):
    ta, tb = bucketed_pair
    j = ta.join(tb, "k").select("k", "va", "vb")
    rows = {r.k: (r.va, r.vb) for r in j.collect()}
    assert rows[1500] == (3000, 4500)
    assert len(rows) == 1000
