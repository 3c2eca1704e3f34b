"""Regression tests for the round-3 continuation review findings: NaN /
NULL poisoning in the similarity and dedup pair generators, NULL mass in
ks_exact, rounded-gate holes (CheckSuite.run, jsd/wasserstein1 operator
rounding), \\Z vs \\z anchoring, multiprobe no-op, all-NULL-column
profiling crash, and leakage_report pair-orientation splitting."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- simhash

def test_simhash_near_dups_ignores_null_and_empty_docs(spark):
    from validr_spark.operators.dedup import simhash_near_dups

    rows = [(f"e{i}", t) for i, t in enumerate([None, "", "   "])]
    rows += [("r1", "the quick brown fox jumps over the lazy dog"),
             ("r2", "an entirely different document about spark plans")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = simhash_near_dups(df, max_hamming=3).collect()
    ids = {x for r in pairs for x in (r["id_a"], r["id_b"])}
    # before the fix: e0/e1/e2 all hash to 0 and pair with each other at
    # hamming 0 (3 spurious pairs)
    assert not ids & {"e0", "e1", "e2"}


def test_simhash_near_dups_still_finds_real_dups(spark):
    from validr_spark.operators.dedup import simhash_near_dups

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [("a", base), ("b", base),
         ("c", "unrelated words entirely distinct content here")],
        "doc_id string, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_near_dups(df, max_hamming=3).collect()}
    assert ("a", "b") in got


# ------------------------------------------------------ NaN-guarded pairs

def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_all_pairs_above_drops_nan_and_zero_norm(spark):
    from validr_spark.operators.similarity import all_pairs_above

    good = [1.0, 0.0, 0.0, 0.0]
    df = _emb_df(spark, [
        (1, good), (2, good),                       # genuine pair
        (3, [float("nan"), 0.0, 0.0, 0.0]),          # NaN component
        (4, [0.0, 0.0, 0.0, 0.0]),                   # zero norm
    ])
    rows = all_pairs_above(df, threshold=0.9, nbits=2).collect()
    ids = {x for r in rows for x in (r["id_a"], r["id_b"])}
    assert 3 not in ids and 4 not in ids
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}
    assert all(not math.isnan(r["cosine"]) for r in rows)


def test_semantic_dedup_pairs_drops_nan(spark):
    from validr_spark.operators.clustering import semantic_dedup_pairs

    good = [0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        [(1, good), (2, good), (3, [float("nan"), 1.0, 0.0])],
        "doc_id long, embedding array<double>")
    rows = semantic_dedup_pairs(df, threshold=0.9, k=1, iters=2,
                                id_col="doc_id").collect()
    ids = {x for r in rows for x in (r["id_a"], r["id_b"])}
    assert 3 not in ids
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in rows}


def test_knn_join_nan_vector_never_ranks(spark):
    from validr_spark.operators.similarity import knn_join

    corpus = _emb_df(spark, [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]),
        (3, [float("nan"), 0.0]),            # would sort rank-1 under desc
    ])
    queries = _emb_df(spark, [(100, [1.0, 0.0])])
    got = knn_join(corpus, queries, k=3).collect()
    assert {r["vec_id"] for r in got} == {1, 2}
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["vec_id"] == 1
    assert not math.isnan(by_rank[1]["cosine"])


# ----------------------------------------------------------------- ks_exact

def test_ks_exact_ignores_nulls(spark):
    from validr_spark.operators.drift import ks_exact

    vals = [float(i) for i in range(10)]
    a = spark.createDataFrame([(v,) for v in vals], "v double")
    b = spark.createDataFrame([(v,) for v in vals]
                              + [(None,)] * 10, "v double")
    ks = ks_exact(a, b, "v").first()["ks"]
    # identical non-null distributions: true KS is 0; pre-fix the 10
    # NULLs inflated nb and produced 0.5
    assert ks == 0.0


# ----------------------------------------------------- rounded-gate holes

def test_check_suite_gates_on_raw_metric(spark):
    from validr_spark.operators.checks import Check, CheckSuite

    # mean = 0.05000004 -> observed rounds to 0.05 but the GATE must see
    # the raw value and fail the hi=0.05 bound
    df = spark.createDataFrame([(0.05000004,)] * 4, "x double")
    rep = CheckSuite("g", [Check.mean("x", between=(0.0, 0.05))]) \
        .run(df, round_digits=6).first()
    assert rep["observed"] == 0.05
    assert rep["passed"] is False
    assert "expect" in rep["message"]


def test_check_matches_rejects_trailing_newline(spark):
    from validr_spark.operators.checks import Check, CheckSuite

    df = spark.createDataFrame([("abc",), ("abc\n",)], "s string")
    rep = CheckSuite("g", [Check.matches("s", "abc", min_ratio=1.0)]) \
        .run(df).first()
    # \Z would match 'abc\n' (ratio 1.0, passed); \z must not
    assert rep["observed"] == 0.5
    assert rep["passed"] is False


def test_jsd_returns_raw_unrounded_metric(spark):
    from validr_spark.operators.drift import jsd

    # distributions differing by one count in 10^6: jsd ~ 1e-13 — a
    # round(..., 9) inside the operator would report exactly 0.0 and any
    # gate on it would pass; raw must stay > 0
    a = spark.createDataFrame([("x", 1_000_000), ("y", 1_000_000)],
                              "c string, n long") \
        .select(F.col("c"), F.explode(F.sequence(F.lit(1), F.col("n")))) \
        .select("c")
    # building 2M rows via sequence-explode is fine at local scale
    b = spark.createDataFrame([("x", 1_000_001), ("y", 999_999)],
                              "c string, n long") \
        .select(F.col("c"), F.explode(F.sequence(F.lit(1), F.col("n")))) \
        .select("c")
    v = jsd(a, b, "c").first()["jsd"]
    assert 0.0 < v < 1e-9


def test_wasserstein1_returns_raw_unrounded_metric(spark):
    from validr_spark.operators.drift import wasserstein1

    shift = 1.234567e-7   # rounds to 0.0 at 6 digits
    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    b = spark.createDataFrame([(float(i) + shift,) for i in range(10)],
                              "v double")
    w1 = wasserstein1(a, b, "v", grid=10, exact=True).first()["w1"]
    assert w1 == pytest.approx(shift, rel=1e-6)


def test_drift_gate_catches_sub_round_jsd_excess(spark):
    from validr_spark.operators.checks import drift_gate

    a = spark.createDataFrame([("x", 1_000_000), ("y", 1_000_000)],
                              "c string, n long") \
        .select(F.col("c"), F.explode(F.sequence(F.lit(1), F.col("n")))) \
        .select("c")
    b = spark.createDataFrame([("x", 1_000_001), ("y", 999_999)],
                              "c string, n long") \
        .select(F.col("c"), F.explode(F.sequence(F.lit(1), F.col("n")))) \
        .select("c")
    rep = drift_gate(a, b, cat_cols=["c"], max_jsd=0.0).first()
    # raw jsd ~1e-13 > bound 0.0 -> must FAIL even though round-9 says 0
    assert rep["passed"] is False


# ------------------------------------------------------------- multiprobe

def test_lsh_topk_multiprobe_widens_candidates(spark):
    from validr_spark.operators.similarity import cosine_topk, lsh_topk

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, (rng.randn(8)).tolist()) for i in range(200)]
    df = _emb_df(spark, rows)
    q = rng.randn(8).tolist()
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    # multiprobe = nbits probes EVERY bucket in every table -> candidate
    # set is the whole corpus -> lsh_topk must equal brute force exactly
    got = [r["vec_id"] for r in
           lsh_topk(df, q, k=5, nbits=4, multiprobe=4,
                    n_tables=1).collect()]
    assert got == exact


# ------------------------------------------------- all-NULL-column suggest

def test_suggest_elements_all_null_columns(spark):
    from validr_spark.operators.suggest import suggest_elements

    df = spark.createDataFrame(
        [(1, None, None, None), (2, None, None, None)],
        "id long, s string, n int, arr array<int>")
    els = suggest_elements(df)
    assert els["s"] == "any.optional"
    assert els["n"] == "any.optional"
    assert els["arr"][0].startswith("list")   # no minlen(None) rendering
    assert "None" not in str(els)


# ------------------------------------------------------- leakage_report

def test_leakage_report_normalizes_split_orientation(spark):
    from validr_spark.operators.contamination import leakage_report

    ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    tb = "lorem ipsum dolor sit amet consectetur adipiscing elit sed " * 3
    # two leaked boundaries with OPPOSITE id orientations: (1 train, 2
    # test) and (3 test, 4 train) — pre-fix these landed in two separate
    # (split_a, split_b) rows of ~half the true count each
    df = spark.createDataFrame(
        [(1, "train", ta), (2, "test", ta),
         (3, "test", tb), (4, "train", tb),
         (5, "train", "completely unrelated text content words here "
                      "nothing shared with anything else at all")],
        "doc_id long, split string, text string")
    rep = leakage_report(df, threshold=0.8).collect()
    assert len(rep) == 1
    row = rep[0]
    assert (row["split_a"], row["split_b"]) == ("test", "train")
    assert row["n_pairs"] == 2
    assert row["n_docs_a"] == 2 and row["n_docs_b"] == 2
