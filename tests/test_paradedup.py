"""C4-style paragraph/line dedup (validr_spark/operators/paradedup.py)."""

import pytest
from pyspark.sql import functions as F

from validr_spark.operators.paradedup import dedup_paragraphs, paragraph_stats

BOILER = "subscribe to our newsletter today"
UNIQ = [f"distinct paragraph number {chr(97 + i)} with real content"
        for i in range(6)]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "\n".join([UNIQ[0], BOILER, UNIQ[1]])),
        (2, "\n".join([BOILER, UNIQ[2], "ok", UNIQ[3]])),   # 'ok' short-exempt
        (3, "\n".join([UNIQ[4], BOILER, UNIQ[4]])),         # internal dup too
        (4, BOILER),                                        # all-dup doc
        (5, "\n".join(["ok", "ok"])),                       # short lines only
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_survives(spark, docs):
    out = {r.doc_id: r for r in dedup_paragraphs(docs, min_chars=5).collect()}
    # doc 1 holds the first global occurrence of BOILER -> keeps it
    assert out[1].text.split("\n") == [UNIQ[0], BOILER, UNIQ[1]]
    assert out[1].n_removed == 0
    # doc 2 loses its BOILER copy, keeps the short-exempt 'ok'
    assert out[2].text.split("\n") == [UNIQ[2], "ok", UNIQ[3]]
    assert out[2].n_removed == 1
    # doc 3: first in-doc copy of UNIQ[4] survives, second removed
    assert out[3].text.split("\n") == [UNIQ[4]]
    assert out[3].n_removed == 2
    # all-duplicate doc still present, empty
    assert out[4].text == "" and out[4].n_removed == 1
    # short-only doc untouched (dedup never sees short lines)
    assert out[5].text.split("\n") == ["ok", "ok"]


def test_min_chars_exemption_keeps_hot_keys_out(spark, docs):
    # with min_chars high enough, nothing qualifies -> identity
    out = dedup_paragraphs(docs, min_chars=1000).collect()
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert all(r.text == orig[r.doc_id] and r.n_removed == 0 for r in out)


def test_paragraph_stats_finds_boilerplate(spark, docs):
    top = paragraph_stats(docs, min_chars=5).collect()
    assert top[0].line == BOILER
    assert top[0].n_occurrences == 4 and top[0].n_docs == 4
    # UNIQ[4] occurs twice within one doc
    assert any(r.line == UNIQ[4] and r.n_occurrences == 2 and r.n_docs == 1
               for r in top)


def test_deterministic(spark, docs):
    a = sorted(map(str, dedup_paragraphs(docs, min_chars=5).collect()))
    b = sorted(map(str, dedup_paragraphs(docs, min_chars=5).collect()))
    assert a == b
