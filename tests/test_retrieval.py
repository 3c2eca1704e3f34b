"""BM25 retrieval (operators/retrieval.py): scores vs a pure-Python
Okapi BM25 reference, multi-query == per-query equivalence, and the
single-scoring-scan plan shape."""

import math
import re

import pytest
from pyspark.sql import functions as F

from validr_spark.operators.retrieval import (bm25_join, bm25_scores,
                                              bm25_topk)

DOCS = [
    (1, "hash join beats sort merge join on small tables"),
    (2, "the window agg runs after the hash agg"),
    (3, "spark shuffles on join keys; broadcast the small side"),
    (4, "sort, then merge: the classic join"),
    (5, "no relevant terms here at all"),
    (6, None),
    (7, ""),
]


def _tok(s):
    return [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]


def ref_bm25(docs, query, k1=1.2, b=0.75):
    words = {i: _tok(t) for i, t in docs}
    n = len(words)
    avgdl = sum(len(w) for w in words.values()) / n
    qs = set(_tok(query))
    dfreq = {t: sum(1 for w in words.values() if t in w) for t in qs}
    out = {}
    for i, w in words.items():
        s = 0.0
        for t in qs:
            tf = w.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(w) / avgdl))
        if s > 0:
            out[i] = s
    return out


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_scores_match_python_reference(docs, spark):
    q = "hash join"
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, q, k=10).collect()}
    want = ref_bm25(DOCS, q)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i]), i


def test_repeated_query_terms_count_once(docs):
    once = {r["doc_id"]: r["score"]
            for r in bm25_topk(docs, "join", k=10).collect()}
    thrice = {r["doc_id"]: r["score"]
              for r in bm25_topk(docs, "join join JOIN", k=10).collect()}
    assert once == pytest.approx(thrice)


def test_multi_query_equals_per_query(docs, spark):
    queries = spark.createDataFrame(
        [(10, "hash join"), (11, "window agg"), (12, "zzz nothing")],
        "query_id int, query string")
    multi = bm25_join(docs, queries, k=3)
    by_q = {}
    for r in multi.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for qid, qtext in [(10, "hash join"), (11, "window agg"),
                       (12, "zzz nothing")]:
        solo = [(r["rank"], r["doc_id"], r["score"])
                for r in bm25_topk(docs, qtext, k=3).collect()]
        assert sorted(by_q.get(qid, [])) == sorted(solo), qtext
    assert 12 not in by_q  # no term hits -> no rows, not zero-score rows


def test_rank_deterministic_tie_break(docs):
    rows = bm25_topk(docs, "join", k=10).orderBy("rank").collect()
    for a, b_ in zip(rows, rows[1:]):
        assert (a["score"], -a["doc_id"]) >= (b_["score"], -b_["doc_id"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_empty_query_returns_empty(docs):
    assert bm25_topk(docs, "  --- !!! ", k=5).count() == 0


def test_scoring_scan_is_reused(docs, spark):
    """tf and df must both read the persisted hits relation (cache fill
    = one corpus scan), so scoring costs two corpus scans total (hits +
    stats), never three.  Column pruning defeats plain ReuseExchange
    here — the cache is the mechanism, so both consumers must show
    InMemoryTableScan."""
    plan = (bm25_scores(docs, spark.createDataFrame(
                [(0, "hash join")], "query_id int, query string"))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("InMemoryTableScan") == 2, plan
    # fully-lazy opt-out keeps working, just with the extra scan
    # (clear the session cache first — Spark substitutes any cached
    # matching subplan into unrelated queries)
    spark.catalog.clearCache()
    lazy = (bm25_scores(docs, spark.createDataFrame(
                [(0, "hash join")], "query_id int, query string"),
                cache_hits=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "InMemoryTableScan" not in lazy, lazy
    spark.catalog.clearCache()
