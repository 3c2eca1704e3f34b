"""Benchmark decontamination: n-gram overlap scan, attribution pairs,
plan shape (broadcast probe, no corpus-wide shuffle)."""
import pytest
from pyspark.sql import functions as F

from validr_spark.operators.contamination import (contamination_pairs,
                                                  contamination_scan,
                                                  ngram_hashes)

BENCH_Q = "what is the capital of france paris of course"


@pytest.fixture(scope="module")
def corpus(spark):
    filler = " ".join(f"w{i}" for i in range(20))
    rows = [
        ("clean1", f"totally unrelated text {filler}"),
        ("leak1", f"{filler} What is the capital of France Paris of course"),
        ("leak_rep", ("what is the capital of france paris of course " * 3)
                     + filler),
        ("short", "too short"),
        ("clean2", " ".join(f"z{i}" for i in range(30))),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [("q1", BENCH_Q), ("q2", "the quick brown fox jumps over a lazy dog")],
        "bench_id string, text string")


def test_ngram_hashes_counts_positions(spark, corpus):
    g = ngram_hashes(corpus, n=8).groupBy("doc_id").count().collect()
    by = {r["doc_id"]: r["count"] for r in g}
    assert "short" not in by                      # < 8 words -> no grams
    assert by["clean2"] == 30 - 7


def test_scan_flags_leaked_docs(spark, corpus, bench_set):
    rep = contamination_scan(corpus, bench_set,
                             bench_text_col="text", n=8)
    by = {r["doc_id"]: r for r in rep.collect()}
    assert by["leak1"]["contaminated"] is True
    assert by["leak_rep"]["contaminated"] is True
    assert by["clean1"]["contaminated"] is False
    assert by["clean2"]["contaminated"] is False
    assert by["short"]["n_grams"] == 0 and by["short"]["n_hits"] == 0
    # repeating the leaked line does not inflate distinct hits:
    # both leaks share the same 2 distinct 8-gram windows of the question
    assert by["leak_rep"]["n_hits"] >= by["leak1"]["n_hits"]
    assert by["leak1"]["n_hits"] == 2             # 9-word question -> 2 grams


def test_pairs_attribute_to_benchmark_item(spark, corpus, bench_set):
    pairs = contamination_pairs(corpus, bench_set, n=8).collect()
    got = {(r["doc_id"], r["bench_id"]) for r in pairs}
    assert ("leak1", "q1") in got
    assert ("leak_rep", "q1") in got
    assert not any(b == "q2" for _, b in got)


def test_min_hits_threshold(spark, corpus, bench_set):
    rep = contamination_scan(corpus, bench_set, n=8, min_hits=3)
    by = {r["doc_id"]: r for r in rep.collect()}
    assert by["leak1"]["contaminated"] is False    # only 2 distinct hits


def test_plan_broadcasts_benchmark(spark, corpus, bench_set):
    rep = contamination_scan(corpus, bench_set, n=8)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # the gram probe against the benchmark set is broadcast at plan time
    assert "BroadcastHashJoin" in plan
    # The hits-attach join is deliberately NOT forced broadcast (a
    # heavily contaminated corpus makes the hit table arbitrarily
    # large); with a small hit table AQE converts it at runtime, so the
    # FINAL plan must still contain no sort-merge exchange of the corpus.
    rep.collect()
    final = rep._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString prints both the final and the initial
    # plan; only the final section matters here.
    final = final.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    assert "SortMergeJoin" not in final


def test_case_insensitive_overlap(spark, bench_set):
    corpus = bench_set.select(F.col("bench_id").alias("doc_id"),
                              F.upper("text").alias("text"))
    rep = contamination_scan(corpus, bench_set, n=8)
    assert all(r["contaminated"] for r in rep.collect())
    assert all(r["hit_fraction"] == 1.0 for r in rep.collect())


def test_decontaminate_is_complement_of_scan(spark, corpus, bench_set):
    from validr_spark.operators.contamination import (contamination_scan,
                                                      decontaminate)
    rep = contamination_scan(corpus, bench_set, n=8, min_hits=1)
    flagged = {r["doc_id"] for r in
               rep.filter(F.col("contaminated")).collect()}
    kept = {r["doc_id"] for r in
            decontaminate(corpus, bench_set, n=8, min_hits=1).collect()}
    allids = {r["doc_id"] for r in corpus.collect()}
    assert kept == allids - flagged
    assert flagged                      # fixture does contain contamination


def test_decontaminate_min_hits_threshold(spark, corpus, bench_set):
    from validr_spark.operators.contamination import decontaminate
    loose = decontaminate(corpus, bench_set, n=8, min_hits=1).count()
    tight = decontaminate(corpus, bench_set, n=8, min_hits=50).count()
    assert loose <= tight               # higher bar drops fewer docs


def test_split_leakage_cross_split_only(spark):
    from validr_spark.operators.contamination import (leakage_report,
                                                      split_leakage)
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "with some extra words to make shingling meaningful here")
    df = spark.createDataFrame(
        [(1, base, "train"),
         (2, base + " tail", "test"),          # near-dup ACROSS splits
         (3, base + " tail2", "train"),        # near-dup within train
         (4, "completely different text about spark plans and shuffles "
             "nothing shared with the fox sentences at all", "test")],
        "doc_id long, text string, split string")
    got = split_leakage(df, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (1, 2) in pairs and (2, 3) in pairs   # cross-split dups
    assert (1, 3) not in pairs                   # same-split: dedup's job
    assert all(r["split_a"] != r["split_b"] for r in got)
    rep = leakage_report(df, threshold=0.5).collect()
    assert sum(r["n_pairs"] for r in rep) == len(got)
    edit = split_leakage(df, threshold=0.5, verify="edit").collect()
    assert {(r["id_a"], r["id_b"]) for r in edit} >= {(1, 2)}


def test_ngram_novelty_hand_math(spark):
    from validr_spark.operators.contamination import ngram_novelty

    ref = spark.createDataFrame(
        [("r1", "a b c d e f g h i j")], "doc_id string, text string")
    df = spark.createDataFrame(
        [("copy", "a b c d e f g h i j"),    # all 3 grams in ref
         ("part", "a b c d e f g h X Y Z"),  # 1 of 4 grams in ref
         ("new", "p q r s t u v w x"),       # none of 2 grams in ref
         ("short", "a b c")],                # < n words: absent
        "doc_id string, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df, ref).collect()}
    assert set(got) == {"copy", "part", "new"}
    assert (got["copy"]["n_grams"], got["copy"]["n_seen"],
            got["copy"]["novelty"]) == (3, 3, 0.0)
    assert (got["part"]["n_grams"], got["part"]["n_seen"],
            got["part"]["novelty"]) == (4, 1, 0.75)
    assert got["new"]["novelty"] == 1.0


def test_ngram_novelty_bloom_equals_exact(spark):
    import random

    from validr_spark.operators.contamination import ngram_novelty

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]

    def doc(k):
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 30)))

    ref = spark.createDataFrame(
        [(f"r{i}", doc(i)) for i in range(40)], "doc_id string, text string")
    df = spark.createDataFrame(
        [(f"d{i}", doc(100 + i)) for i in range(30)],
        "doc_id string, text string")
    exact = sorted(map(tuple, ngram_novelty(df, ref, n=4).collect()))
    # tight bloom (fpp forces real prefilter decisions) must stay exact
    bloomed = sorted(map(tuple, ngram_novelty(
        df, ref, n=4, use_bloom=True, fpp=0.2).collect()))
    assert exact == bloomed


def test_ngram_novelty_dedups_repeated_grams(spark):
    from validr_spark.operators.contamination import ngram_novelty

    ref = spark.createDataFrame(
        [("r", "a b c d e")], "doc_id string, text string")
    # the leaked 3-gram repeats 3x but counts once; novelty over DISTINCT
    df = spark.createDataFrame(
        [("d", "a b c a b c a b c")], "doc_id string, text string")
    r = ngram_novelty(df, ref, n=3).collect()[0]
    # distinct grams: 'a b c','b c a','c a b' -> only 'a b c' seen
    assert (r["n_grams"], r["n_seen"]) == (3, 1)


def test_token_contamination_scan_hand_math(spark):
    from validr_spark.operators.contamination import token_contamination_scan

    bench = spark.createDataFrame(
        [([10, 11, 12, 13, 14],)], "tokens array<int>")
    corpus = spark.createDataFrame(
        [("full", [10, 11, 12, 13, 14]),      # 3 grams, all shared
         ("part", [9, 10, 11, 12, 13, 14]),   # 4 grams, 3 shared
         ("none", [1, 2, 3, 4, 5, 6]),        # 4 grams, 0 shared
         ("short", [10, 11])],                # < n: 0 grams
        "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in token_contamination_scan(
        corpus, bench, n=3).collect()}
    assert (got["full"]["n_grams"], got["full"]["n_hits"],
            got["full"]["contaminated"]) == (3, 3, True)
    assert (got["part"]["n_grams"], got["part"]["n_hits"]) == (4, 3)
    assert got["part"]["hit_fraction"] == 0.75
    assert (got["none"]["n_hits"], got["none"]["contaminated"]) == (0, False)
    assert (got["short"]["n_grams"], got["short"]["n_hits"]) == (0, 0)


def test_token_contamination_distinct_hits_and_plan(spark):
    from validr_spark.operators.contamination import token_contamination_scan
    from validr_spark.testing import assert_no_python, assert_plan

    bench = spark.createDataFrame([([7, 7, 7, 7],)], "tokens array<int>")
    # the leaked gram (7,7,7) repeats 4x positionally but counts ONCE
    corpus = spark.createDataFrame(
        [("rep", [7, 7, 7, 7, 7, 7])], "doc_id string, tokens array<int>")
    out = token_contamination_scan(corpus, bench, n=3)
    r = out.collect()[0]
    assert (r["n_grams"], r["n_hits"]) == (4, 1)
    assert_no_python(out)
    assert_plan(out, contains=["BroadcastHashJoin"])
    # hits-attach is deliberately not forced broadcast (see
    # contamination_scan); with a tiny hit table AQE converts it, so
    # the FINAL plan shuffles nothing corpus-wide through a sort-merge
    final = out._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
