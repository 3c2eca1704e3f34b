"""Portable 48-bit SimHash (operators/dedup.py simhash_portable):
md5-derived word hashes + conditional-sum bit votes, pure codegen — the
engine-neutral variant whose near-dup pair output DuckDB reproduces
exactly (__spark_entry__.py simhash_oracle).  Here: fingerprint
byte-equality vs a pure-Python reference, pair-set equality vs
brute-force blocking, and the no-Python plan guarantee the production
(pandas-UDF blake2b) simhash cannot give.
"""
import hashlib
import re

import pytest

from validr_spark.operators.dedup import (simhash_near_dups_portable,
                                          simhash_portable)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup
    (2, "the quick brown fox jumped over the lazy dog"),       # near dup
    (3, "  The   QUICK brown\tfox jumps over the lazy dog "),  # normalizes
    (4, "completely different content about spark engines running fast"),
    (5, ""),
    (6, None),
]


def simhash48_py(text):
    s = re.sub(r"\s+", " ", (text or "").strip().lower())
    if not s:
        return None
    votes = [0] * 48
    for w in s.split(" "):
        if not w:
            continue
        m = int(hashlib.md5(w.encode()).hexdigest()[:12], 16)
        for b in range(48):
            votes[b] += 1 if (m >> b) & 1 else -1
    return sum(1 << b for b in range(48) if votes[b] > 0)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_portable_simhash_matches_python_reference(docs_df):
    got = {r["doc"]: r["simhash"] for r in simhash_portable(docs_df).collect()}
    want = {i: simhash48_py(t) for i, t in DOCS if simhash48_py(t) is not None}
    assert got == want
    assert got[3] == got[0] == got[1]          # normalization folds 3 into 0/1
    assert all(0 <= v < (1 << 48) for v in got.values())


def test_portable_simhash_pairs_match_bruteforce(docs_df):
    blocks, width, max_h = 4, 12, 8
    fps = {i: simhash48_py(t) for i, t in DOCS}
    buckets = {}
    for doc, fp in fps.items():
        if fp is None:
            continue
        for b in range(blocks):
            buckets.setdefault((b, (fp >> (b * width)) & 0xFFF),
                               []).append(doc)
    want = set()
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                h = bin(fps[lo] ^ fps[hi]).count("1")
                if h <= max_h:
                    want.add((lo, hi, h))

    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in simhash_near_dups_portable(docs_df).collect()}
    assert got == want
    assert (0, 1, 0) in got                    # exact dups at hamming 0


def test_portable_simhash_plan_has_no_python_nodes(docs_df):
    from validr_spark.testing import assert_no_python
    assert_no_python(simhash_near_dups_portable(docs_df))
