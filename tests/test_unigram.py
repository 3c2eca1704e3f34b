"""Unigram-LM tokenizer: Viterbi semantics, EM training determinism
and likelihood behavior, distributed==local, char fallback, plan."""

import math

import pytest
from pyspark.sql import functions as F

from validr_spark.operators.unigram import (
    apply_unigram, train_unigram, train_unigram_from_counts,
    unigram_ids, viterbi_segment)

TOY = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_viterbi_picks_max_logprob_segmentation():
    v = {"a": -1.0, "b": -1.0, "c": -1.0, "ab": -1.5, "abc": -2.5}
    # a+b+c = -3, ab+c = -2.5, abc = -2.5: tie between the last two;
    # the smallest-split-point rule keeps the single piece
    assert viterbi_segment("abc", v) == ["abc"]
    assert viterbi_segment("abab", v) == ["ab", "ab"]
    assert viterbi_segment("abd", v) is None          # 'd' unknown
    assert viterbi_segment("", v) == []


def test_viterbi_matches_exhaustive_enumeration():
    """Viterbi == brute-force max over all segmentations whenever the
    max is unique — the property the driver oracle's exhaustive
    lattice replay needs."""
    import itertools
    import random

    rng = random.Random(3)
    vocab = {}
    for ln in (1, 2, 3):
        for t in itertools.product("ab", repeat=ln):
            vocab["".join(t)] = round(rng.uniform(-5, -0.5), 6)

    def exhaustive(word):
        n = len(word)
        bests = []
        for cuts in itertools.product([0, 1], repeat=max(n - 1, 0)):
            pieces, start = [], 0
            for i, c in enumerate(cuts, 1):
                if c:
                    pieces.append(word[start:i])
                    start = i
            pieces.append(word[start:])
            if all(p in vocab for p in pieces):
                bests.append((sum(vocab[p] for p in pieces), pieces))
        if not bests:
            return None
        top = max(b[0] for b in bests)
        winners = [p for s, p in bests if s == top]
        return winners if len(winners) > 1 else winners[0]

    for _ in range(200):
        w = "".join(rng.choice("ab") for _ in range(rng.randint(1, 8)))
        exp = exhaustive(w)
        got = viterbi_segment(w, vocab, max_piece_len=3)
        if isinstance(exp, list) and exp and isinstance(exp[0], list):
            assert got in exp, (w, got, exp)    # tie: any max is right
        else:
            assert got == exp, (w, got, exp)


def test_em_training_deterministic_and_normalized():
    a = train_unigram_from_counts(TOY, em_iters=4)
    b = train_unigram_from_counts(dict(reversed(list(TOY.items()))),
                                  em_iters=4)
    assert a == b and a
    total = sum(math.exp(v) for v in a.values())
    assert total == pytest.approx(1.0, rel=1e-6)


def test_em_concentrates_on_reused_pieces():
    # 'est' occurs in newest+widest (9 total) — EM should give the
    # whole piece more mass than the product of its characters
    v = train_unigram_from_counts(TOY, em_iters=6)
    assert v["est"] > v["e"] + v["s"] + v["t"]
    # with no pruning, EM concentrates hardest on whole training
    # words — 'newest' segments as itself; a NOVEL word sharing the
    # suffix reuses a multi-char piece instead of characters
    assert viterbi_segment("newest", v) == ["newest"]
    seg = viterbi_segment("tewest", v)    # novel word, seen chars:
    assert seg is not None                # one multi-char suffix piece
    assert max(len(p) for p in seg) > 1   # beats the char chain


def test_vocab_size_prunes_but_keeps_chars():
    v = train_unigram_from_counts(TOY, em_iters=3, vocab_size=10)
    chars = {c for w in TOY for c in w}
    assert chars <= set(v)
    total = sum(math.exp(x) for x in v.values())
    assert total == pytest.approx(1.0, rel=1e-6)


def test_apply_unigram_matches_local_and_falls_back(spark):
    v = train_unigram_from_counts(TOY, em_iters=4, round_to=8)
    ids = unigram_ids(v)
    df = spark.createDataFrame(
        [(1, "low newest"), (2, "lowest"), (3, None), (4, "q!z")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["tokens"]
           for r in apply_unigram(df, v, ids=ids).collect()}
    import re
    expect1 = []
    for w in re.findall(r"\S+", "low newest"):
        expect1 += [ids[s] for s in viterbi_segment(w, v)]
    assert got[1] == expect1
    assert got[3] is None
    # 'q!z': no piece known -> char fallback -> all unk (-1)
    assert got[4] == [-1, -1, -1]
    pieces = {r["doc_id"]: r["tokens"]
              for r in apply_unigram(df, v).collect()}
    assert pieces[4] == ["q", "!", "z"]


def test_train_unigram_distributed_equals_counts(spark):
    df = spark.createDataFrame(
        [(w,) for w, c in TOY.items() for _ in range(c)], "text string")
    assert train_unigram(df, em_iters=3) == \
        train_unigram_from_counts(TOY, em_iters=3)


def test_tokens_match_unigram_flags_only_corrupted_rows(spark):
    from validr_spark.operators.unigram import tokens_match_unigram

    v = train_unigram_from_counts(TOY, em_iters=4, round_to=8)
    ids = unigram_ids(v)
    base = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["low newest", "widest", "lower"])],
        "doc_id long, text string")
    good = apply_unigram(base, v, ids=ids)
    tampered = good.withColumn(
        "tokens",
        F.when(F.col("doc_id") == 1,
               F.concat("tokens", F.array(F.lit(777))))
        .otherwise(F.col("tokens")))
    viol = {r["id"]: r for r in tokens_match_unigram(
        tampered, v, ids=ids).collect()}
    assert set(viol) == {1}
    assert viol[1]["rule_id"] == "tokens.unigram_mismatch"
    n = len(good.filter("doc_id = 1").first()["tokens"])
    assert viol[1]["value"] == str(n)          # appended position
    assert "unigram(text)" in viol[1]["message"]
    assert tokens_match_unigram(good, v, ids=ids).count() == 0


def test_pinned_driver_vocab_is_tie_free():
    """The entry-file pinned table must stay tie-free over every
    sf0.01 corpus word AND every prefix of one (any substr cut) — the
    property that makes the driver oracle's exhaustive arg_max exact.
    If retraining ever changes the table, this is the gate that must
    pass before re-pinning."""
    import itertools
    import re

    import duckdb

    import __spark_entry__ as entrymod

    v = entrymod.UNIGRAM_VOCAB
    L = entrymod.UNIGRAM_MAX_PIECE
    rows = duckdb.connect().execute(
        "SELECT text FROM "
        "'/root/testdata/sf0.01/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()
    probes = set()
    for (t,) in rows:
        for w in re.findall(r"[^ \t\n\r\f\x0B]+", t):
            for i in range(1, len(w) + 1):
                probes.add(w[:i])
    assert probes
    for w in sorted(probes):
        n = len(w)
        best, winners = None, 0
        for cuts in itertools.product([0, 1], repeat=max(n - 1, 0)):
            pieces, start = [], 0
            for i, c in enumerate(cuts, 1):
                if c:
                    pieces.append(w[start:i])
                    start = i
            pieces.append(w[start:])
            if all(p in v and len(p) <= L for p in pieces):
                s = 0.0
                for p in pieces:
                    s += v[p]
                if best is None or s > best:
                    best, winners = s, 1
                elif s == best:
                    winners += 1
        assert best is not None, f"unsegmentable word {w!r}"
        assert winners == 1, f"score tie on {w!r}"
        # and Viterbi's pick is THE max (prefix-sum order == path order)
        seg = viterbi_segment(w, v, L)
        s = 0.0
        for p in seg:
            s += v[p]
        assert s == best, w


def test_apply_unigram_single_python_stage(spark):
    v = train_unigram_from_counts(TOY, em_iters=2)
    df = spark.createDataFrame([(1, "low")], "doc_id long, text string")
    plan = (apply_unigram(df, v)
            .select(F.posexplode("tokens"))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("ArrowEvalPython") == 1      # Finding 18 barrier
