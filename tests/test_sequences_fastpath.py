"""Explode-based sequence fast path ≡ generic compiler, row for row."""

from pyspark.sql import functions as F

from validr_spark.compiler import SparkCompiler
from validr_spark.datagen import (SOURCES, VOCAB, make_sequences,
                                  make_sources_dim, sequences_schema)
from validr_spark.operators import sequences as seqops


def _norm(df, id_col):
    return sorted(
        tuple(r) for r in
        df.select(id_col, "rule_id", "position", "message", "value")
        .collect())


def test_fastpath_matches_generic_engine(spark):
    df = make_sequences(spark, 4000, maxlen=64).withColumn(
        "_rid", F.monotonically_increasing_id())

    generic = SparkCompiler().compile(sequences_schema()).apply(
        df, id_cols=["_rid"]).violations()
    fast = seqops.sequence_violations(
        df, vocab=VOCAB, maxlen=8192, sources=SOURCES, id_col="_rid",
        max_n_tok=8192)

    g, f = _norm(generic, "_rid"), _norm(fast, "_rid")
    assert len(g) > 0
    assert g == f


def test_fastpath_maxlen_suppression(spark):
    # bad element at idx < maxlen suppresses the list maxlen violation;
    # bad element only at idx >= maxlen lets maxlen win
    rows = [
        (0, list(range(10)) + [-5] + [0] * 10),   # bad elem idx 10 < 16
        (1, [0] * 20),                            # only too long
        (2, [0] * 15 + [99999] * 5),              # bad elem at 15 < 16
        (3, [0] * 16 + [-1]),                     # bad elem only at 16
    ]
    df = spark.createDataFrame(rows, "_rid long, tokens array<int>") \
        .withColumn("doc_id", F.concat(F.lit("d-"), F.col("_rid"))) \
        .withColumn("n_tok", F.lit(1)) \
        .withColumn("source", F.lit("web"))

    from validr_spark import T
    schema = T.dict(
        doc_id=T.str.minlen(1).maxlen(64),
        tokens=T.list(T.int.min(0).max(50256)).minlen(1).maxlen(16),
        n_tok=T.int.min(1).max(16),
        source=T.enum(" ".join(SOURCES)),
    )
    generic = SparkCompiler().compile(schema).apply(
        df, id_cols=["_rid"]).violations()
    fast = seqops.sequence_violations(
        df, vocab=50257, maxlen=16, sources=SOURCES, id_col="_rid",
        max_n_tok=16)
    assert _norm(generic, "_rid") == _norm(fast, "_rid")
    by_rid = {}
    for r in _norm(fast, "_rid"):
        by_rid.setdefault(r[0], []).append(r[1])
    assert by_rid[0] == ["tokens[].min"]
    assert by_rid[1] == ["tokens.maxlen"]
    assert by_rid[2] == ["tokens[].max"]
    assert by_rid[3] == ["tokens.maxlen"]


def test_sequence_report_counts(spark):
    df = make_sequences(spark, 20000, maxlen=64)
    rep = seqops.sequence_report(df, make_sources_dim(spark), vocab=VOCAB,
                                 maxlen=8192, sources=SOURCES,
                                 max_n_tok=8192)
    total_rows = sum(r["n_rows"] for r in rep["per_source"])
    assert total_rows == 20000
    assert rep["dup_keys"] > 0
    assert sum(r["n_orphans"] for r in rep["per_source"]) > 0
    assert sum(r["n_token_violations"] for r in rep["per_source"]) > 0
    assert sum(r["n_inconsistent"] for r in rep["per_source"]) > 0


def test_report_attributes_unknown_source_token_violations(spark):
    """Rows whose source is NOT in the configured list must still have their
    token-violation counts attributed (previously collapsed into the null
    bucket / silently dropped)."""
    rows = [
        ("d1", [1, 2, 3], 3, "web"),           # known, clean
        ("d2", [-5, 2], 2, "mystery"),         # unknown source, 1 bad token
        ("d3", [VOCAB + 7], 1, None),          # null source, 1 bad token
        ("d4", [-1, -2], 2, "mystery"),        # unknown source, 2 bad tokens
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    rep = seqops.sequence_report(df, make_sources_dim(spark), vocab=VOCAB,
                                 maxlen=8192, sources=SOURCES,
                                 max_n_tok=8192)
    by_src = {r["source"]: r for r in rep["per_source"]}
    assert by_src["mystery"]["n_token_violations"] == 3
    assert by_src[None]["n_token_violations"] == 1
    assert by_src["web"]["n_token_violations"] == 0


def test_position_token_stats_template_detection(spark):
    import math
    from validr_spark.operators.sequences import position_token_stats
    # 64 sequences: position 0 constant (template header), position 1
    # has 2 values, position 2 unique per row
    rows = [([7, i % 2, i],) for i in range(64)]
    df = spark.createDataFrame(rows, "tokens array<int>")
    got = {r["pos"]: r for r in position_token_stats(df).collect()}
    assert got[0]["entropy"] == 0.0 and got[0]["top_share"] == 1.0
    assert got[0]["top_token"] == 7 and got[0]["n_distinct_tokens"] == 1
    assert abs(got[1]["entropy"] - 1.0) < 1e-6       # fair coin
    assert abs(got[2]["entropy"] - math.log2(64)) < 1e-6
    assert all(r["n_seqs"] == 64 for r in got.values())


def test_position_token_stats_bounds_and_ragged(spark):
    from validr_spark.operators.sequences import position_token_stats
    df = spark.createDataFrame(
        [([1, 2, 3],), ([1],), ([1, 9],), (None,)], "tokens array<int>")
    got = {r["pos"]: r for r in position_token_stats(df, max_pos=2).collect()}
    assert set(got) == {0, 1}                         # max_pos respected
    assert got[0]["n_seqs"] == 3                      # null row excluded
    assert got[1]["n_seqs"] == 2                      # ragged tails ok
    # deterministic tie-break: counts 1/1 at pos 1 -> smaller token wins
    assert got[1]["top_token"] == 2


def test_token_ngram_stats_hand_math(spark):
    from validr_spark.operators.sequences import token_ngram_stats

    df = spark.createDataFrame(
        [("a", [1, 2, 3, 4]),       # 3 distinct bigrams
         ("b", [5, 5, 5, 5]),       # (5,5) x3: pure loop
         ("c", [1, 2, 1, 2, 1]),    # (1,2)x2 (2,1)x2: phrase repeat
         ("d", [7]),                # < n tokens: absent
         ("e", None)],              # null: absent
        "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in token_ngram_stats(df).collect()}
    assert set(got) == {"a", "b", "c"}
    assert (got["a"]["n_ngrams"], got["a"]["n_distinct"]) == (3, 3)
    assert got["a"]["dup_ngram_frac"] == 0.0
    assert got["b"]["dup_ngram_frac"] == 0.666667
    assert got["b"]["top_ngram_share"] == 1.0
    assert got["b"]["loop_frac"] == 1.0          # single-token loop
    assert got["c"]["dup_ngram_frac"] == 0.5
    assert got["c"]["top_ngram_share"] == 0.5
    assert got["c"]["loop_frac"] == 0.0          # repeated PHRASE, no loop


def test_token_ngram_stats_trigrams_and_guard(spark):
    import pytest as _pytest

    from validr_spark.operators.sequences import token_ngram_stats

    df = spark.createDataFrame(
        [("a", [9, 9, 9, 9, 1])],   # trigrams (9,9,9)x2 (9,9,1)
        "doc_id string, tokens array<int>")
    r = token_ngram_stats(df, n=3).collect()[0]
    assert (r["n_ngrams"], r["n_distinct"]) == (3, 2)
    assert r["loop_frac"] == 0.666667
    with _pytest.raises(ValueError, match="n must be"):
        token_ngram_stats(df, n=0)


def test_token_ngram_stats_plan_all_codegen(spark):
    from validr_spark.operators.sequences import token_ngram_stats
    from validr_spark.testing import assert_no_python, assert_plan

    df = spark.createDataFrame(
        [("a", [1, 2, 3])], "doc_id string, tokens array<int>")
    out = token_ngram_stats(df)
    assert_no_python(out)
    # codegen slice/zip construction, not an interpreted lambda HOF
    assert_plan(out, absent=["LambdaFunction"])


def test_token_ngram_stats_random_matches_python(spark):
    import random
    from collections import Counter

    from validr_spark.operators.sequences import token_ngram_stats

    rng = random.Random(23)
    rows = []
    for i in range(60):
        ln = rng.randint(0, 12)
        # small vocab so duplicates/loops actually occur
        rows.append((f"d{i}", [rng.randint(0, 4) for _ in range(ln)]))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    n = 3
    got = {r["doc_id"]: r for r in token_ngram_stats(df, n=n).collect()}
    expected_ids = set()
    for doc_id, toks in rows:
        if len(toks) < n:
            assert doc_id not in got
            continue
        expected_ids.add(doc_id)
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        total = sum(c.values())
        loop = sum(v for g, v in c.items() if len(set(g)) == 1)
        r = got[doc_id]
        assert r["n_ngrams"] == total
        assert r["n_distinct"] == len(c)
        assert r["dup_ngram_frac"] == round(1 - len(c) / total, 6)
        assert r["top_ngram_share"] == round(max(c.values()) / total, 6)
        assert r["loop_frac"] == round(loop / total, 6)
    assert set(got) == expected_ids
