"""Chunking operators (operators/chunking.py): sliding-window split of
token arrays / raw text into fixed-size training windows with overlap.
Verified against an independent pure-Python reference chunker, plus
reconstruction (no token lost, overlap exact) and plan-shape (zero
Exchange) properties."""

import random

import pytest
from pyspark.sql import functions as F

from validr_spark.operators.chunking import chunk_documents, chunk_text


def ref_chunks(seq, window, overlap):
    """Independent reference: windows at 0, S, 2S, ... until the end is
    covered; a doc that fits is one chunk; empty input is one empty
    chunk."""
    stride = window - overlap
    if len(seq) <= window:
        return [seq]
    out = []
    start = 0
    while True:
        out.append(seq[start:start + window])
        if start + window >= len(seq):
            return out
        start += stride


def test_chunk_documents_matches_python_reference(spark):
    rng = random.Random(42)
    rows = [(i, [rng.randrange(1000) for _ in range(rng.randrange(0, 120))])
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    for window, overlap in [(16, 0), (16, 4), (8, 7), (1, 0)]:
        got = {r["chunk_id"]: list(r["tokens"])
               for r in chunk_documents(df, window, overlap).collect()}
        want = {}
        for i, toks in rows:
            for j, c in enumerate(ref_chunks(toks, window, overlap)):
                want[f"{i}#{j}"] = c
        assert got == want, f"window={window} overlap={overlap}"


def test_chunk_reconstruction_lossless(spark):
    """Stitching chunks by their window offsets (chunk i overwrites
    positions [i*S, i*S+len)) rebuilds every document exactly — proves
    the union of windows covers [0, n) with correct content, including
    the tail chunk that re-reaches already-emitted tokens."""
    rng = random.Random(7)
    rows = [(i, [rng.randrange(50) for _ in range(n)])
            for i, n in enumerate([0, 1, 15, 16, 17, 31, 32, 33, 100])]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    out = chunk_documents(df, 16, 4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], list(r["tokens"]), r["n_chunks"],
             r["n_tok"]))
    for doc_id, toks in rows:
        chunks = sorted(by_doc[doc_id])
        assert len(chunks) == chunks[0][2]  # n_chunks consistent
        # coverage: stitch via window arithmetic, compare to original
        rebuilt = list(chunks[0][1])
        for idx, c, _, _ in chunks[1:]:
            start = idx * 12  # stride = 16 - 4
            rebuilt = rebuilt[:start] + c
        assert rebuilt == toks, doc_id
        for _, c, _, n_tok in chunks:
            assert n_tok == len(c) <= 16


def test_chunk_null_and_empty_rows_kept(spark):
    df = spark.createDataFrame(
        [(1, None), (2, [])], "doc_id int, tokens array<int>")
    out = chunk_documents(df, 8).collect()
    assert {(r["doc_id"], r["n_chunks"], r["n_tok"],
             tuple(r["tokens"])) for r in out} == {
        (1, 1, 0, ()), (2, 1, 0, ())}


def test_chunk_bad_params_raise(spark):
    df = spark.createDataFrame([(1, [1])], "doc_id int, tokens array<int>")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 8, overlap=8)
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(df, 0)


def test_chunk_plan_has_no_exchange(spark):
    df = spark.createDataFrame(
        [(1, list(range(40)))], "doc_id int, tokens array<int>")
    plan = chunk_documents(df, 16, 4)._jdf.queryExecution().executedPlan()
    assert "Exchange" not in plan.toString()


def test_chunk_text_matches_python_reference(spark):
    texts = [
        "",                       # empty -> one empty chunk
        "   ",                    # whitespace-only -> one empty chunk
        "one",                    # single word
        "a  b\tc\nd e",           # whitespace runs collapse
        " ".join(f"w{i}" for i in range(23)),
        " ".join(f"w{i}" for i in range(8)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    out = chunk_text(df, max_words=8, overlap=2)
    got = {r["chunk_id"]: (r["text"], r["n_words"], r["n_chunks"])
           for r in out.collect()}
    want = {}
    for i, t in enumerate(texts):
        words = t.split()
        for j, c in enumerate(ref_chunks(words, 8, 2)):
            want[f"{i}#{j}"] = (" ".join(c), len(c),
                                len(ref_chunks(words, 8, 2)))
    assert got == want


def test_chunks_feed_packer_without_truncation(spark):
    """The composed story: chunk first, then pack — no truncated bins."""
    from validr_spark.operators.packing import pack_greedy

    rng = random.Random(3)
    rows = [(i, [rng.randrange(10) for _ in range(rng.randrange(0, 300))])
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    chunks = chunk_documents(df, 64)
    packed = pack_greedy(chunks, max_tokens=64, id_col="chunk_id",
                         len_col="n_tok", num_shards=4)
    assert packed.filter(F.col("truncated")).count() == 0
    assert packed.count() == chunks.count()
