"""Tests for the training-data pipeline layer added on top of the
reference's validator surface: deterministic sampling/splitting/mixing
(operators/sampling.py), PII scan/redact (operators/pii.py), and the
Gopher-style repetition signals (operators/textstats.py).

No counterpart in guyskk/validr (single-row validation only); these are
the distributed-pipeline operators the brief asks for.  The oracle gate
(__spark_entry__: sample_split / sample_mix / pii_audit /
repetition_topk / top_ngram) cross-checks values vs DuckDB; these tests
cover the properties the oracle can't express (determinism under
re-partitioning, leakage, redaction idempotence, prefilter equivalence).
"""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from validr_spark.operators import pii, sampling, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [Row(doc_id=i, source=f"s{i % 4}",
                text=f"alpha beta gamma {i} delta {'rep ' * (i % 5)}end")
            for i in range(400)]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_hash_sample_matches_python_md5(spark, docs):
    """Membership is exactly 'first 8 hex of md5(seed|key) < threshold' —
    reproducible outside Spark entirely."""
    kept = {r.doc_id for r in
            sampling.hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    thr = sampling.fraction_threshold(0.3)
    expect = {i for i in range(400)
              if hashlib.md5(f"42|{i}".encode()).hexdigest()[:8] < thr}
    assert kept == expect
    assert 0.2 < len(kept) / 400 < 0.4


def test_hash_sample_invariant_under_repartition(spark, docs):
    a = sorted(r.doc_id for r in
               sampling.hash_sample(docs, 0.5, "doc_id").collect())
    b = sorted(r.doc_id for r in
               sampling.hash_sample(docs.repartition(17), 0.5, "doc_id").collect())
    assert a == b


def test_fraction_threshold_edges():
    assert sampling.fraction_threshold(0.0) == "00000000"
    # keep-all sentinel sorts above every hex digest
    assert sampling.fraction_threshold(1.0) == "gggggggg"
    assert sampling.fraction_threshold(-3) == "00000000"
    assert sampling.fraction_threshold(2.0) == "gggggggg"


def test_split_assign_partitions_exactly_once(spark, docs):
    sp = sampling.split_assign(docs, {"train": 8, "val": 1, "test": 1},
                               key="doc_id")
    rows = sp.groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in rows}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 400          # total preserved
    assert counts["train"] > counts.get("val", 0)
    # leakage guarantee: same key+seed never migrates across runs
    again = sampling.split_assign(docs.repartition(7),
                                  {"train": 8, "val": 1, "test": 1},
                                  key="doc_id")
    m1 = {r.doc_id: r.split for r in sp.collect()}
    m2 = {r.doc_id: r.split for r in again.collect()}
    assert m1 == m2


def test_split_assign_validates_weights(spark, docs):
    with pytest.raises(ValueError):
        sampling.split_assign(docs, {}, key="doc_id")
    with pytest.raises(ValueError):
        sampling.split_assign(docs, {"a": 0.0}, key="doc_id")


def test_weighted_mix_rates(spark, docs):
    mixed = sampling.weighted_mix(docs, {"s0": 1.0, "s1": 0.0}, "source",
                                  key="doc_id", default_rate=0.5)
    rep = {r.source: r for r in
           sampling.sample_report(docs, mixed, "source").collect()}
    assert rep["s0"].rate == 1.0
    assert rep["s1"].n_kept == 0
    assert 0.25 < rep["s2"].rate < 0.75
    with pytest.raises(ValueError):
        sampling.weighted_mix(docs, {"s0": 1.5}, "source", key="doc_id")


def test_stratified_sample_exact_k_and_prefilter_equivalence(spark, docs):
    k = 5
    full = sampling.stratified_sample(docs, "source", k, key="doc_id")
    counts = {r.source: r["count"] for r in
              full.groupBy("source").count().collect()}
    assert all(v == k for v in counts.values())
    # hash order is stable under subsetting: a generous prefilter keeps
    # the exact same per-stratum winners
    pre = sampling.stratified_sample(docs, "source", k, key="doc_id",
                                     prefilter=0.5)
    ids_full = sorted(r.doc_id for r in full.collect())
    ids_pre = sorted(r.doc_id for r in pre.collect())
    assert ids_full == ids_pre


def test_stratified_sample_small_stratum(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, g="only") for i in range(3)])
    out = sampling.stratified_sample(df, "g", 10, key="doc_id")
    assert out.count() == 3


# ---------------------------------------------------------------------------
# pii
# ---------------------------------------------------------------------------

PII_TEXT = ("write to bob.smith+x@example.co.uk or 10.1.2.3, "
            "card 4111 1111 1111 1111, ssn 123-45-6789, "
            "call +44 1234 5678, id 550e8400-e29b-41d4-a716-446655440000, "
            "v6 2001:db8:0:0:0:0:2:1 end")


def test_pii_scan_counts(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=PII_TEXT),
                                Row(doc_id=2, text="clean prose only")])
    rows = {r.doc_id: r for r in pii.pii_scan(df).collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_ipv4, r1.n_credit_card, r1.n_ssn) == (1, 1, 1, 1)
    assert r1.n_uuid == 1 and r1.n_phone == 1 and r1.n_ipv6 == 1
    assert r1.has_pii and r1.n_pii == 7
    assert not rows[2].has_pii and rows[2].n_pii == 0


def test_pii_redact_scrubs_all_and_is_idempotent(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=PII_TEXT)])
    red = pii.pii_redact(df)
    txt = red.collect()[0].text
    for name in pii.REDACT_ORDER:
        assert f"[{name.upper()}]" in txt
    # nothing detectable remains, and a second pass is a no-op
    assert pii.pii_scan(red).collect()[0].n_pii == 0
    again = pii.pii_redact(red).collect()[0].text
    assert again == txt


def test_pii_redact_subset_and_out_col(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=PII_TEXT)])
    red = pii.pii_redact(df, classes=["email"], out_col="clean")
    row = red.collect()[0]
    assert "[EMAIL]" in row.clean and "10.1.2.3" in row.clean
    assert row.text == PII_TEXT                 # original untouched


def test_pii_prevalence(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=PII_TEXT if i % 2 == 0 else "clean")
         for i in range(10)])
    r = pii.pii_prevalence(df).collect()[0]
    assert r.n_docs == 10
    assert r.docs_email == 5 and r.hits_email == 5
    assert r.docs_credit_card == 5


# ---------------------------------------------------------------------------
# repetition / top-ngram
# ---------------------------------------------------------------------------

def test_repetition_features(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d"),                  # no repetition
        Row(doc_id=2, text="x x x x"),                  # 3/4 dup words
        Row(doc_id=3, text="l1\nl2\nl1\n  l2  \nl3"),   # 2/5 dup lines
    ])
    r = {x.doc_id: x for x in df.select(
        "doc_id", textstats.repetition_features("text").alias("r"))
        .select("doc_id", "r.*").collect()}
    assert r[1].dup_word_fraction == 0.0
    assert r[2].dup_word_fraction == pytest.approx(0.75)
    assert r[3].n_lines == 5
    assert r[3].dup_line_fraction == pytest.approx(0.4)


def test_quality_filter_reasons(spark):
    good = "the quick brown fox jumps over the lazy dog again " * 3
    df = spark.createDataFrame([
        Row(doc_id=1, text=good),                       # passes all rules
        Row(doc_id=2, text="short text"),               # too few words
        Row(doc_id=3, text="!!! ??? *** " + good),      # punct ok? no: diluted
        Row(doc_id=4, text="1234 5678 " + "9 " * 40),   # digit-heavy
        Row(doc_id=5, text="spam " * 50),               # low unique ratio
    ])
    rows = {r.doc_id: r for r in textstats.quality_filter(df).collect()}
    assert rows[1].keep and rows[1].reasons == ""
    assert not rows[2].keep and "too_few_words" in rows[2].reasons
    assert not rows[4].keep and "digit_ratio" in rows[4].reasons
    assert not rows[5].keep and "unique_word_ratio" in rows[5].reasons


def test_top_ngram_stats(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="to be or not to be"),       # 'to be' twice / 5
        Row(doc_id=2, text="one"),                      # < n words: dropped
    ])
    rows = {r.doc_id: r for r in
            textstats.top_ngram_stats(df, n=2).collect()}
    assert set(rows) == {1}
    assert rows[1].n_ngrams == 5
    assert rows[1].top_ngram_count == 2
    assert rows[1].top_ngram_fraction == pytest.approx(0.4)


# --- deterministic training order -------------------------------------------

def test_training_order_deterministic_and_dense(spark, docs):
    out1 = sampling.training_order(docs, "doc_id", shards=16)
    out2 = sampling.training_order(docs.repartition(9), "doc_id", shards=16)
    a = sorted(map(tuple, out1.select("doc_id", "shard", "pos").collect()))
    b = sorted(map(tuple, out2.select("doc_id", "shard", "pos").collect()))
    assert a == b
    # every shard's positions are dense 1..n
    rows = out1.select("shard", "pos").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # order is a pure function of md5: matches a python recompute
    import hashlib
    exp = sorted(
        ((int(hashlib.md5(f"42|{i}".encode()).hexdigest()[:8], 16) % 16)
         for i in range(400)))
    got = sorted(r["shard"] for r in rows)
    assert got == exp


def test_training_order_rejects_bad_shards(spark, docs):
    with pytest.raises(ValueError, match="shards"):
        sampling.training_order(docs, "doc_id", shards=0)


def test_temperature_weights_hand_math(spark):
    import math
    from validr_spark.operators.sampling import temperature_weights
    # 80/20 split; alpha=0.5: q ∝ sqrt(p)
    df = spark.createDataFrame(
        [("web", 80), ("wiki", 20)], "source string, n_chars long")
    rows = {r["grp"]: r for r in temperature_weights(
        df, weight_col="n_chars", alpha=0.5,
        total_budget=1000).collect()}
    sa, sb = math.sqrt(0.8), math.sqrt(0.2)
    assert abs(rows["web"]["q"] - sa / (sa + sb)) < 1e-6
    assert abs(rows["wiki"]["q"] - sb / (sa + sb)) < 1e-6
    assert rows["web"]["budget"] + rows["wiki"]["budget"] <= 1000
    # smoothing upsamples the tail: q_wiki > p_wiki, q_web < p_web
    assert rows["wiki"]["q"] > rows["wiki"]["p"]
    assert rows["web"]["q"] < rows["web"]["p"]


def test_temperature_weights_limits(spark):
    import pytest
    from validr_spark.operators.sampling import temperature_weights
    df = spark.createDataFrame(
        [("a",)] * 90 + [("b",)] * 10, "source string")
    natural = {r["grp"]: r["q"]
               for r in temperature_weights(df, alpha=1.0).collect()}
    assert abs(natural["a"] - 0.9) < 1e-6        # alpha=1: natural shares
    near_uniform = {r["grp"]: r["q"]
                    for r in temperature_weights(df, alpha=0.01).collect()}
    assert abs(near_uniform["a"] - 0.5) < 0.02   # alpha→0: uniform
    with pytest.raises(ValueError):
        temperature_weights(df, alpha=0.0)


def test_write_training_shards_on_disk_order(spark, tmp_path):
    import glob
    import pyarrow.parquet as pq
    from validr_spark.operators.sampling import (training_order,
                                                 write_training_shards)
    df = spark.createDataFrame([(f"d{i}",) for i in range(500)],
                               "doc_id string")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, "doc_id", shards=8)
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 8
    # inside each shard file, rows are physically in pos order, and the
    # (shard, pos) assignment equals training_order's
    expect = {(r["shard"], r["pos"]): r["doc_id"]
              for r in training_order(df, "doc_id", shards=8).collect()}
    seen = 0
    for d in dirs:
        shard = int(d.rsplit("=", 1)[1])
        for f in sorted(glob.glob(d + "/*.parquet")):
            t = pq.read_table(f).to_pydict()
            assert t["pos"] == sorted(t["pos"])          # physical order
            for pos, doc in zip(t["pos"], t["doc_id"]):
                assert expect[(shard, pos)] == doc
                seen += 1
    assert seen == 500


def test_upsample_epochs_counts_and_determinism(spark):
    from validr_spark.operators.sampling import upsample_epochs
    df = spark.createDataFrame(
        [(f"d{i}", "web" if i < 400 else "wiki") for i in range(500)],
        "doc_id string, source string")
    up = upsample_epochs(df, {"wiki": 3.0, "web": 0.5},
                         source_col="source", key="doc_id")
    rows = up.groupBy("source", "epoch").count().collect()
    by = {(r["source"], r["epoch"]): r["count"] for r in rows}
    # wiki x3 exact full epochs
    assert by[("wiki", 0)] == by[("wiki", 1)] == by[("wiki", 2)] == 100
    # web 0.5: one fractional epoch, ~200 of 400 (binomial-ish via md5)
    assert set(e for s, e in by if s == "web") == {0}
    assert 150 < by[("web", 0)] < 250
    # deterministic: identical on rerun
    again = {(r["source"], r["epoch"]): r["count"]
             for r in upsample_epochs(df, {"wiki": 3.0, "web": 0.5},
                                      "source", "doc_id")
             .groupBy("source", "epoch").count().collect()}
    assert again == by


def test_upsample_epochs_invariants(spark):
    import pytest
    from validr_spark.operators.sampling import upsample_epochs
    df = spark.createDataFrame(
        [(f"d{i}", "a") for i in range(50)], "doc_id string, source string")
    up = upsample_epochs(df, {"a": 2.5}, "source", "doc_id")
    # epoch 0 recovers the original corpus exactly
    assert up.filter(F.col("epoch") == 0).count() == 50
    # (key, epoch) unique
    assert up.groupBy("doc_id", "epoch").count() \
        .filter("count > 1").count() == 0
    # unlisted source default keeps exactly one epoch
    other = spark.createDataFrame([("x", "b")], "doc_id string, source string")
    kept = upsample_epochs(other, {"a": 2.0}, "source", "doc_id").collect()
    assert len(kept) == 1 and kept[0]["epoch"] == 0
    # rate 0 drops the source entirely
    assert upsample_epochs(other, {"b": 0.0}, "source",
                           "doc_id").count() == 0
    with pytest.raises(ValueError):
        upsample_epochs(df, {"a": -1}, "source", "doc_id")
