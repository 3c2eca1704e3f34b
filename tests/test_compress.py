"""compression_ratio / compression_report — zlib quality signal."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from validr_spark.operators.compress import (compression_ratio,
                                             compression_report)

PROSE = ("The quick brown fox jumps over the lazy dog while the farmer "
         "watches from a distance, wondering whether the harvest will "
         "survive another storm this autumn season. Meanwhile the river "
         "keeps rising past the old stone bridge, and children gather "
         "reeds along its muddy banks before dusk settles over the "
         "valley. Nobody remembers a wetter year, though the almanac "
         "insists eighteen ninety-two was worse by every measure kept.")
JUNK = "buy now " * 120
# deterministic incompressible noise: base64 of an md5 chain
import base64 as _b64
import hashlib as _hl

NOISE = "".join(
    _b64.b64encode(_hl.md5(str(i).encode()).digest()).decode()
    for i in range(40))


def ref_ratio(text, level=6):
    b = text.encode("utf-8")
    return len(zlib.compress(b, level)) / len(b)


def test_matches_direct_zlib(spark):
    rows = [("p", PROSE), ("j", JUNK), ("n", NOISE)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["r"] for r in
           df.select("doc_id",
                     compression_ratio("text").alias("r")).collect()}
    for doc, text in rows:
        assert got[doc] == pytest.approx(ref_ratio(text), abs=1e-12)


def test_separates_junk_prose_noise(spark):
    df = spark.createDataFrame(
        [("p", PROSE), ("j", JUNK), ("n", NOISE)],
        "doc_id string, text string")
    got = {r["doc_id"]: r["r"] for r in
           df.select("doc_id",
                     compression_ratio("text").alias("r")).collect()}
    assert got["j"] < 0.2 < got["p"] < 0.7 < got["n"]


def test_null_and_empty_are_null(spark):
    df = spark.createDataFrame([("a", None), ("b", "")],
                               "doc_id string, text string")
    got = df.select(compression_ratio("text").alias("r")).collect()
    assert all(r["r"] is None for r in got)


def test_report_counts_band_violations(spark):
    df = spark.createDataFrame(
        [("s1", PROSE), ("s1", JUNK), ("s2", NOISE), ("s2", None)],
        "source string, text string")
    got = {r["source"]: r for r in
           compression_report(df, lo=0.25, hi=0.7).collect()}
    assert got["s1"]["n_docs"] == 2 and got["s1"]["n_scored"] == 2
    assert got["s1"]["n_too_repetitive"] == 1       # JUNK
    assert got["s2"]["n_scored"] == 1               # null text unscored
    assert got["s2"]["n_noise"] == 1                # NOISE above hi band
    assert got["s1"]["min_ratio"] == pytest.approx(
        round(ref_ratio(JUNK), 6), abs=1e-6)


def test_level_changes_ratio_deterministically(spark):
    df = spark.createDataFrame([("a", PROSE)], "doc_id string, text string")
    r1 = df.select(compression_ratio("text", level=1).alias("r")).first()["r"]
    r9 = df.select(compression_ratio("text", level=9).alias("r")).first()["r"]
    assert r1 == pytest.approx(ref_ratio(PROSE, 1), abs=1e-12)
    assert r9 == pytest.approx(ref_ratio(PROSE, 9), abs=1e-12)
    assert r9 <= r1


def test_report_zero_scored_group_counts_are_zero(spark):
    df = spark.createDataFrame([("s1", None), ("s1", "")],
                               "source string, text string")
    row = compression_report(df).first()
    assert row["n_scored"] == 0
    assert row["n_too_repetitive"] == 0 and row["n_noise"] == 0
