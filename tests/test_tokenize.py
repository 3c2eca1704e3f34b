"""Hash-vocabulary tokenization (validr_spark/operators/tokenize.py)."""

import pytest
from pyspark.sql import functions as F

from validr_spark import T, SparkCompiler
from validr_spark.operators.textstats import bpe_ish_token_count
from validr_spark.operators.tokenize import (bpe_pieces, hash_tokens,
                                             tokenize_documents)

VOCAB = 1000


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Hello, world! This is document one.", "web"),
        (2, "Numbers 123 and symbols #tag... mixed-case WORDS", "books"),
        (3, "short", "web"),
        (4, "", "code"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_n_tok_agrees_with_counting_path(spark, docs):
    """size(tokens) == textstats.bpe_ish_token_count — shared regex."""
    out = docs.select(
        F.size(bpe_pieces(F.col("text"))).alias("a"),
        bpe_ish_token_count(F.col("text")).alias("b")).collect()
    assert all(r.a == r.b for r in out)


def test_tokenize_output_shape_and_validates(spark, docs):
    seq = tokenize_documents(docs, vocab=VOCAB)
    assert [f.name for f in seq.schema.fields] == \
        ["doc_id", "tokens", "n_tok", "source"]
    rows = {r.doc_id: r for r in seq.collect()}
    assert rows["3"].n_tok == 2          # 'shor' + 't'
    assert rows["4"].tokens == [] and rows["4"].n_tok == 0
    assert all(0 <= t < VOCAB for r in rows.values() for t in r.tokens)
    # the sequence schema validates the output clean, incl. the n_tok
    # invariant carried by construction
    schema = T.dict(doc_id=T.str.minlen(1),
                    tokens=T.list(T.int.min(0).max(VOCAB - 1)),
                    n_tok=T.int.min(0),
                    source=T.enum(["web", "books", "code"]))
    res = SparkCompiler().compile(schema).apply(
        seq.withColumn("_id", F.col("doc_id")), id_cols=["_id"])
    assert res.violations().count() == 0
    from validr_spark.operators.consistency import n_tok_consistency
    assert n_tok_consistency(seq).count() == 0


def test_deterministic_and_piece_hash_stable(spark, docs):
    a = tokenize_documents(docs, vocab=VOCAB).collect()
    b = tokenize_documents(docs, vocab=VOCAB).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    # same piece → same id everywhere (hash vocabulary is a pure function)
    one = spark.createDataFrame([("is is",)], "text string") \
        .select(hash_tokens(F.col("text"), VOCAB).alias("t")).head().t
    assert one[0] == one[1]


def test_plan_is_one_scan_no_shuffle(spark, docs):
    plan = tokenize_documents(docs, vocab=VOCAB) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the transform runs once per row: a single projection carries it
    assert plan.count("transform(") == 1
