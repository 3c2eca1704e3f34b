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


def test_build_vocab_ids_and_coverage(spark):
    from validr_spark.operators.tokenize import build_vocab
    df = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "aa cc !")], "doc_id long, text string")
    rows = build_vocab(df, top_v=10).collect()
    by_piece = {r["piece"]: r for r in rows}
    # specials pinned at 0..3
    assert [r["piece"] for r in rows[:4]] == ["<pad>", "<bos>", "<eos>",
                                              "<unk>"]
    # pieces: aa x3, bb x1, cc x1, ! x1 -> aa first (id 4), then ! bb cc
    assert by_piece["aa"]["token_id"] == 4
    assert by_piece["aa"]["count"] == 3
    assert [r["piece"] for r in rows[4:]] == ["aa", "!", "bb", "cc"]
    assert abs(by_piece["aa"]["cum_coverage"] - 3 / 6) < 1e-9
    assert abs(by_piece["cc"]["cum_coverage"] - 1.0) < 1e-9


def test_tokenize_with_vocab_roundtrip_and_oov(spark):
    from validr_spark.operators.tokenize import (build_vocab,
                                                 tokenize_with_vocab)
    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat")], "doc_id long, text string")
    vocab = build_vocab(train, top_v=10)
    vmap = {r["piece"]: r["token_id"] for r in vocab.collect()}
    new = spark.createDataFrame(
        [(9, "the cat flew", "s1"), (10, "", "s1")],
        "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in tokenize_with_vocab(new, vocab).collect()}
    # "flew" splits to "flew" (<=4 letters) and is OOV -> <unk>
    assert out["9"]["tokens"] == [vmap["the"], vmap["cat"], vmap["<unk>"]]
    assert out["9"]["n_tok"] == 3
    # empty document survives as an empty sequence, not a dropped row
    assert out["10"]["tokens"] == [] and out["10"]["n_tok"] == 0
    assert out["9"]["source"] == "s1"


def test_tokenize_with_vocab_order_preserved_long_doc(spark):
    import re
    from validr_spark.operators.tokenize import (PIECE_REGEX, build_vocab,
                                                 tokenize_with_vocab)
    text = " ".join(f"w{i % 7}" for i in range(300))
    df = spark.createDataFrame([(1, text, "s")],
                               "doc_id long, text string, source string")
    vocab = build_vocab(df, top_v=50)
    vmap = {r["piece"]: r["token_id"] for r in vocab.collect()}
    got = tokenize_with_vocab(df.repartition(8), vocab).collect()[0]
    expect = [vmap.get(p, vmap["<unk>"])
              for p in re.findall(PIECE_REGEX, text)]
    assert got["tokens"] == expect          # exact order through the shuffle


def test_vocab_coverage_oov_rates(spark):
    from validr_spark.operators.tokenize import build_vocab, vocab_coverage
    train = spark.createDataFrame(
        [(1, "aa bb aa bb cc")], "doc_id long, text string")
    vocab = build_vocab(train, top_v=2)          # keeps aa, bb only
    corpus = spark.createDataFrame(
        [("s1", "aa bb aa"), ("s1", "aa zz"), ("s2", "zz yy xx")],
        "source string, text string")
    rows = {r["source"]: r for r in vocab_coverage(corpus, vocab).collect()}
    # s1: pieces aa bb aa aa zz -> 1 OOV of 5
    assert (rows["s1"]["n_pieces"], rows["s1"]["n_oov"]) == (5, 1)
    assert abs(rows["s1"]["oov_rate"] - 0.2) < 1e-6
    # s2: all 3 OOV
    assert rows["s2"]["oov_rate"] == 1.0
    total = vocab_coverage(corpus, vocab, by=None).collect()[0]
    assert (total["n_pieces"], total["n_oov"]) == (8, 4)
