"""Repeated-substring spans (operators/spans.py) and entropy signals
(textstats.word_entropy, drift.value_entropy)."""

import math

import pytest
from pyspark.sql import functions as F

from validr_spark.operators.drift import value_entropy
from validr_spark.operators.spans import (duplicate_spans,
                                          positioned_ngrams,
                                          span_dedup_stats)
from validr_spark.operators.textstats import word_entropy

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words


@pytest.fixture()
def docs(spark):
    rows = [
        # doc 1 and 2 share the 8-word passage at different offsets
        (1, f"{SHARED} tail one two three"),
        (2, f"lead in words here {SHARED}"),
        (3, "completely unrelated text with no duplicated passage at all"),
        (4, None),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positioned_ngrams_positions(spark, docs):
    g = positioned_ngrams(docs, n=8)
    by_doc = {r["doc_id"]: r["pos"]
              for r in g.groupBy("doc_id").agg(
                  F.min("pos").alias("pos")).collect()}
    assert by_doc[1] == 0 and by_doc[2] == 0
    # doc 5 (1 word) and doc 4 (null) produce no grams
    assert 4 not in by_doc and 5 not in by_doc


def test_duplicate_spans_survivor_and_range(spark, docs):
    s = duplicate_spans(docs, n=8).collect()
    spans = {r["doc_id"]: r for r in s}
    assert set(spans) == {1, 2}
    # doc 1: passage at words 0..7, single gram
    assert (spans[1]["start_word"], spans[1]["end_word"],
            spans[1]["n_grams"]) == (0, 7, 1)
    # doc 2: passage at words 4..11
    assert (spans[2]["start_word"], spans[2]["end_word"]) == (4, 11)
    # global first occurrence orders by (doc_id, pos): doc 1 keeps
    assert spans[1]["keep"] is True and spans[2]["keep"] is False


def test_duplicate_spans_merges_adjacent_runs(spark):
    # 10 shared words → three 8-gram positions → ONE maximal span
    shared = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    df = spark.createDataFrame(
        [(1, shared + " unique1 filler"), (2, "pre " + shared)],
        "doc_id long, text string")
    s = {r["doc_id"]: r for r in duplicate_spans(df, n=8).collect()}
    assert (s[1]["start_word"], s[1]["end_word"], s[1]["n_grams"]) \
        == (0, 9, 3)
    assert (s[2]["start_word"], s[2]["end_word"]) == (1, 10)


def test_span_dedup_stats(spark, docs):
    r = span_dedup_stats(docs, n=8).collect()[0]
    assert r["n_docs_affected"] == 2 and r["n_spans"] == 2
    assert r["n_spans_cut"] == 1
    assert r["dup_words_total"] == 16 and r["cut_words_total"] == 8


def test_word_entropy_hand_math(spark):
    # "a a b" → counts {a:2, b:1}, H = log2(3) - (2*1 + 1*0)/3
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    r = word_entropy(df).collect()[0]
    expect = math.log2(3) - (2 * math.log2(2)) / 3
    assert r["n_words"] == 3 and r["n_distinct_words"] == 2
    assert abs(r["entropy"] - expect) < 1e-6


def test_word_entropy_uniform_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d")], "doc_id long, text string")
    by = {r["doc_id"]: r["entropy"] for r in word_entropy(df).collect()}
    assert by[1] == 0.0          # single repeated word: zero entropy
    assert abs(by[2] - 2.0) < 1e-6   # 4 uniform words: 2 bits


def test_value_entropy_groups_and_nulls(spark):
    df = spark.createDataFrame(
        [("s1", "en"), ("s1", "en"), ("s1", "de"), ("s1", None),
         ("s2", "fr")],
        "source string, lang string")
    out = {r["source"]: r for r in
           value_entropy(df, "lang", by=["source"]).collect()}
    # null lang ignored: s1 has n=3 over {en:2, de:1}
    assert out["s1"]["n"] == 3 and out["s1"]["n_distinct"] == 2
    expect = math.log2(3) - (2 * math.log2(2)) / 3
    assert abs(out["s1"]["entropy"] - expect) < 1e-6
    assert out["s2"]["entropy"] == 0.0


def test_unigram_logprob_hand_math(spark):
    from validr_spark.operators.textstats import unigram_logprob
    # ref corpus: "a a a b"; doc: "a b z" → p(a)=3/4, p(b)=1/4, z OOV=0.5/4
    ref = spark.createDataFrame([(9, "a a a b")], "doc_id long, text string")
    df = spark.createDataFrame([(1, "a b z")], "doc_id long, text string")
    r = unigram_logprob(df, ref=ref).collect()[0]
    expect = (math.log2(3 / 4) + math.log2(1 / 4) + math.log2(0.5 / 4)) / 3
    assert r["n_words"] == 3
    assert abs(r["oov_fraction"] - 1 / 3) < 1e-6
    assert abs(r["avg_logprob"] - expect) < 1e-6


def test_unigram_logprob_topv_matches_exact_on_head(spark):
    from validr_spark.operators.textstats import unigram_logprob
    rows = [(i, "common common common rare%d" % i) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    headv = {r["doc_id"]: r
             for r in unigram_logprob(df, top_v=1).collect()}
    # "common" dominates: head model keeps it; rare words OOV-floor.
    # OOV floor (0.5/N) vs exact (1/N): logprob differs by exactly 1 bit
    # on the 1-of-4 rare word → 0.25 bits on the average.
    for i in exact:
        assert abs(headv[i]["oov_fraction"] - 0.25) < 1e-6
        assert abs((exact[i]["avg_logprob"] - headv[i]["avg_logprob"])
                   - 0.25) < 1e-6


def test_unigram_logprob_self_scoring_no_oov(spark):
    from validr_spark.operators.textstats import unigram_logprob
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x x")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert all(r["oov_fraction"] == 0.0 for r in out.values())
    # p(x)=3/4, p(y)=1/4
    assert abs(out[1]["avg_logprob"]
               - (math.log2(0.75) + math.log2(0.25)) / 2) < 1e-6


def test_cut_duplicate_spans_keeps_first_copy(spark, docs):
    from validr_spark.operators.spans import cut_duplicate_spans
    out = {r["doc_id"]: r for r in
           cut_duplicate_spans(docs, n=8).collect()}
    # doc 1 holds the surviving copy: untouched (case/order preserved)
    assert out[1]["text"] == f"{SHARED} tail one two three"
    assert out[1]["n_words_removed"] == 0
    # doc 2 loses the 8-word passage, keeps its lead-in
    assert out[2]["text"] == "lead in words here"
    assert out[2]["n_words"] == 4 and out[2]["n_words_removed"] == 8
    # untouched docs come through verbatim (whitespace-canonical)
    assert out[3]["n_words_removed"] == 0
    assert out[5]["text"] == "short"


def test_cut_duplicate_spans_preserves_case(spark):
    from validr_spark.operators.spans import cut_duplicate_spans
    up = SHARED.upper()
    df = spark.createDataFrame(
        [(1, f"{SHARED} extra words following here"),
         (2, f"{up} trailing body of document two")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in cut_duplicate_spans(df, n=8).collect()}
    # grams match case-insensitively; doc 2's copy is cut, case intact
    assert out[1]["text"].startswith("alpha")
    assert out[2]["text"] == "trailing body of document two"


def test_cut_duplicate_spans_whole_doc_cut(spark):
    from validr_spark.operators.spans import cut_duplicate_spans
    df = spark.createDataFrame(
        [(1, SHARED + " and more"), (2, SHARED)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in cut_duplicate_spans(df, n=8).collect()}
    assert out[2]["text"] == "" and out[2]["n_words"] == 0
    assert out[2]["n_words_removed"] == 8


# --- CCNet buckets + per-bucket sampling ------------------------------------

def test_logprob_buckets_assignment(spark):
    from validr_spark.operators.textstats import (logprob_buckets,
                                                  unigram_logprob)
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "the cat"), (3, "zzz qqq www")],
        ["doc_id", "text"])
    ref = spark.createDataFrame([(9, "the the the the cat")],
                                ["doc_id", "text"])
    scored = {r["doc_id"]: r["avg_logprob"]
              for r in unigram_logprob(df, ref=ref).collect()}
    # doc1 all head words, doc3 all OOV: pick cutoffs between the scores
    assert scored[1] > scored[2] > scored[3]
    lo = (scored[2] + scored[3]) / 2
    hi = (scored[1] + scored[2]) / 2
    out = {r["doc_id"]: r["bucket"]
           for r in logprob_buckets(df, [hi, lo], ref=ref).collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_logprob_buckets_requires_cutoffs(spark):
    import pytest as _pytest
    from validr_spark.operators.textstats import logprob_buckets
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="cutoff"):
        logprob_buckets(df, [])


def test_ccnet_sample_rates_and_determinism(spark):
    from validr_spark.operators.textstats import ccnet_sample
    rows = [(i, "the cat sat" if i % 2 else "zz qq ww") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = spark.createDataFrame([(9999, "the cat sat on the mat")],
                                ["doc_id", "text"])
    # matching docs -> bucket 0 (keep all); OOV docs -> tail (keep 10%)
    kept = ccnet_sample(df, cutoffs=[-3.0], rates={0: 1.0}, ref=ref,
                        default_rate=0.1)
    got = kept.collect()
    n_head = sum(1 for r in got if r["bucket"] == 0)
    n_tail = sum(1 for r in got if r["bucket"] == 1)
    assert n_head == 200                      # every head doc kept
    assert 5 <= n_tail <= 45                  # ~10% of 200 tail docs
    # original columns survive the join-back
    assert set(kept.columns) >= {"doc_id", "text", "avg_logprob", "bucket"}
    again = ccnet_sample(df.repartition(7), cutoffs=[-3.0], rates={0: 1.0},
                         ref=ref, default_rate=0.1)
    assert sorted(r["doc_id"] for r in got) == \
        sorted(r["doc_id"] for r in again.collect())


def test_ccnet_sample_keeps_wordless_docs_in_tail(spark):
    from validr_spark.operators.textstats import ccnet_sample
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "   "), (4, None)],
        ["doc_id", "text"])
    ref = spark.createDataFrame([(9, "the cat sat on the mat")],
                                ["doc_id", "text"])
    kept = ccnet_sample(df, cutoffs=[-3.0], rates={0: 1.0, 1: 1.0},
                        ref=ref, default_rate=1.0)
    got = {r["doc_id"]: (r["bucket"], r["avg_logprob"])
           for r in kept.collect()}
    # keep-everything rates => EVERY input row survives; wordless docs
    # land in the tail bucket with a NULL score
    assert set(got) == {1, 2, 3, 4}
    assert got[1][0] == 0
    for d in (2, 3, 4):
        assert got[d] == (1, None)


def test_logprob_buckets_rejects_bad_cutoffs(spark):
    import pytest as _pytest
    from validr_spark.operators.textstats import logprob_buckets
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="strictly"):
        logprob_buckets(df, [-5.0, -4.0])      # ascending
    with _pytest.raises(ValueError, match="strictly"):
        logprob_buckets(df, [-4.0, -4.0])      # duplicate


def test_collocations_hand_math(spark):
    from validr_spark.operators.textstats import collocations
    # corpus: 3 docs, adjacent pairs countable by hand
    df = spark.createDataFrame(
        [(1, "new york new york"), (2, "new york city"), (3, "big city")],
        "doc_id long, text string")
    rows = {(r["w1"], r["w2"]): r
            for r in collocations(df, min_count=1).collect()}
    # unigrams: new=3, york=3, city=2, big=1  (nw=9)
    # bigrams: (new,york)=3, (york,new)=1, (york,city)=1,
    #          (big,city)=1                   (nb=6)
    ny = rows[("new", "york")]
    assert ny["pair_count"] == 3 and ny["w1_count"] == 3
    lift = (3 * 9 * 9) / (3 * 3 * 6)
    assert abs(ny["lift"] - lift) < 1e-9
    import math
    assert abs(ny["pmi"] - math.log2(lift)) < 1e-9
    assert rows[("big", "city")]["w2_count"] == 2
    assert len(rows) == 4


def test_top_collocations_order_and_min_count(spark):
    from validr_spark.operators.textstats import top_collocations
    df = spark.createDataFrame(
        [(1, "a b a b c d"), (2, "a b c d c d")],
        "doc_id long, text string")
    got = top_collocations(df, k=2, min_count=2).collect()
    assert len(got) == 2
    # every surviving pair occurs >= 2 times; ordering by pmi desc
    assert got[0]["pmi"] >= got[1]["pmi"]
