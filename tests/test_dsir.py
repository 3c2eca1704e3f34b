"""DSIR importance resampling (operators/dsir.py): weight hand-math,
smoothing semantics, broadcast-head mode, Gumbel top-k determinism and
bias.  The oracle gate (__spark_entry__: dsir_select) hash-matches the
full weights+selection pipeline vs DuckDB; these tests cover the
properties the oracle can't express (partitioning invariance, head-mode
equivalence, softmax bias direction).

No counterpart in guyskk/validr (single-value validation only).
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from validr_spark.operators.dsir import (dsir_select, dsir_weights,
                                         importance_sample)


@pytest.fixture(scope="module")
def corpora(spark):
    # raw: half "code-like", half "prose-like"; target: prose only
    raw = spark.createDataFrame(
        [Row(doc_id=i,
             text=("the cat sat on the mat and the dog ran" if i % 2
                   else "def foo bar return int void null ptr"))
         for i in range(40)])
    target = spark.createDataFrame(
        [Row(doc_id=1000 + i, text="the cat and the dog sat")
         for i in range(10)])
    return raw, target


def test_weight_hand_math(spark):
    """3-word corpus, closed-form add-alpha check."""
    raw = spark.createDataFrame([Row(doc_id=1, text="a a b"),
                                 Row(doc_id=2, text="b c")])
    target = spark.createDataFrame([Row(doc_id=9, text="a b")])
    out = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    # models: target counts {a:1, b:1}, N_t=2; raw counts {a:2, b:2, c:1},
    # N_r=5; shared vocab V=3, alpha=0.5
    def lp(c, n):
        return math.log2((c + 0.5) / (n + 0.5 * 3))
    w_a = lp(1, 2) - lp(2, 5)      # in both models
    w_b = lp(1, 2) - lp(2, 5)
    w_c = lp(0, 2) - lp(1, 5)      # target-OOV, raw singleton
    assert out[1]["n_words"] == 3
    assert out[1]["log_weight"] == pytest.approx((2 * w_a + w_b) / 3,
                                                 abs=1e-6)
    assert out[2]["log_weight"] == pytest.approx((w_b + w_c) / 2, abs=1e-6)
    # the target-matching doc outranks the one carrying the OOV word
    assert out[1]["log_weight"] > out[2]["log_weight"]


def test_weights_rank_target_like_docs_higher(spark, corpora):
    raw, target = corpora
    w = dsir_weights(raw, target).collect()
    prose = [r["log_weight"] for r in w if r["doc_id"] % 2 == 1]
    code = [r["log_weight"] for r in w if r["doc_id"] % 2 == 0]
    assert min(prose) > max(code)


def test_out_of_both_heads_gets_singleton_penalty(spark):
    """A word outside BOTH truncated heads is scored as a raw singleton
    at the target smoothing floor (c_t=0, c_r=1) — NOT a neutral 0,
    which would let rare-vocabulary junk score like an average doc.
    Here y really is a raw singleton, so head mode == exact mode."""
    raw = spark.createDataFrame(
        [Row(doc_id=1, text="x x x x y"),      # y = tail word
         Row(doc_id=2, text="x x x x")])
    target = spark.createDataFrame([Row(doc_id=9, text="x x x z")])
    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_weights(raw, target, top_v=1).collect()}

    def lp(c, n, v=3):
        return math.log2((c + 0.5) / (n + 0.5 * v))
    w_x = lp(3, 4) - lp(8, 9)
    w_y = lp(0, 4) - lp(1, 9)
    assert w[2] == pytest.approx(round(w_x, 6), abs=1e-6)
    assert w[1] == pytest.approx(round((4 * w_x + w_y) / 5, 6), abs=2e-6)
    exact = {r["doc_id"]: r["log_weight"]
             for r in dsir_weights(raw, target).collect()}
    assert w == exact


def test_head_mode_matches_exact_when_v_covers_vocab(spark, corpora):
    raw, target = corpora
    exact = {r["doc_id"]: r["log_weight"]
             for r in dsir_weights(raw, target).collect()}
    head = {r["doc_id"]: r["log_weight"]
            for r in dsir_weights(raw, target, top_v=1000).collect()}
    assert exact == head


def test_weights_partitioning_invariant(spark, corpora):
    raw, target = corpora
    a = sorted(map(tuple, dsir_weights(raw, target).collect()))
    b = sorted(map(tuple,
                   dsir_weights(raw.repartition(7), target).collect()))
    assert a == b


def test_sample_deterministic_and_subset(spark, corpora):
    raw, target = corpora
    w = dsir_weights(raw, target)
    s1 = sorted(r["doc_id"] for r in importance_sample(w, 15).collect())
    s2 = sorted(r["doc_id"]
                for r in importance_sample(w.repartition(5), 15).collect())
    assert s1 == s2 and len(s1) == 15
    all_ids = {r["doc_id"] for r in raw.collect()}
    assert set(s1) <= all_ids
    # a different seed gives a different (but equally deterministic) set
    s3 = sorted(r["doc_id"]
                for r in importance_sample(w, 15, seed="7").collect())
    assert s3 != s1


def test_low_temperature_follows_weights(spark, corpora):
    raw, target = corpora
    sel = dsir_select(raw, target, 15, temperature=1e-6)
    ids = [r["doc_id"] for r in sel.collect()]
    # at temperature -> 0 the softmax is argmax: prose docs (odd ids,
    # exactly matching the target distribution) fill all 15 slots
    assert all(i % 2 == 1 for i in ids)


def test_arg_validation(spark, corpora):
    raw, target = corpora
    w = dsir_weights(raw, target)
    with pytest.raises(ValueError, match="k must be positive"):
        importance_sample(w, 0)
    with pytest.raises(ValueError, match="temperature"):
        importance_sample(w, 5, temperature=0.0)


def test_wordless_docs_enter_draw_with_neutral_weight(spark):
    raw = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, None)], ["doc_id", "text"])
    target = spark.createDataFrame([(9, "the cat")], ["doc_id", "text"])
    # k = all rows: every doc must come back, wordless ones neutral
    out = {r["doc_id"]: (r["n_words"], r["log_weight"])
           for r in dsir_select(raw, target, 3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == (0, 0.0) and out[3] == (0, 0.0)
