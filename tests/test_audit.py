"""sampled_violation_rates / wilson_bounds — sampled validation audit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from validr_spark import T
from validr_spark.compiler import SparkCompiler
from validr_spark.operators.audit import sampled_violation_rates
from validr_spark.operators.sampling import fraction_threshold, hash_prefix


def ref_wilson(k, n, z=1.959964):
    """Independent Wilson score interval reference."""
    p = k / n
    z2 = z * z
    denom = 1 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / denom
    return max(0.0, center - half), min(1.0, center + half)


@pytest.fixture(scope="module")
def corpus(spark):
    # 400 rows; n_chars violates min(0)?  Use schema n_chars int in
    # [10, 100]: rows with i % 10 == 0 get n_chars=999 (max violation),
    # i % 17 == 0 get NULL lang (required violation)
    rows = [(i,
             999 if i % 10 == 0 else 50,
             None if i % 17 == 0 else "en")
            for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, n_chars int, lang string")


def schema():
    return T.dict(n_chars=T.int.min(10).max(100), lang=T.enum("en de"))


def test_full_fraction_is_exact(spark, corpus):
    plan = SparkCompiler().compile(schema())
    out = {r["rule_id"]: r for r in
           sampled_violation_rates(corpus, plan, fraction=1.0,
                                   id_cols=["doc_id"]).collect()}
    assert out["n_chars.max"]["n_viol"] == 40
    assert out["lang.required"]["n_viol"] == 24      # 0,17,...,391
    assert all(r["n_sample"] == 400 for r in out.values())
    assert out["n_chars.max"]["rate"] == 0.1
    assert out["n_chars.max"]["est_violations"] == 40


def test_wilson_bounds_match_reference(spark, corpus):
    plan = SparkCompiler().compile(schema())
    out = {r["rule_id"]: r for r in
           sampled_violation_rates(corpus, plan, fraction=1.0,
                                   id_cols=["doc_id"]).collect()}
    for rule, k in (("n_chars.max", 40), ("lang.required", 24)):
        lo, hi = ref_wilson(k, 400)
        assert out[rule]["rate_lo"] == pytest.approx(round(lo, 6), abs=1e-6)
        assert out[rule]["rate_hi"] == pytest.approx(round(hi, 6), abs=1e-6)
        assert out[rule]["rate_lo"] <= k / 400 <= out[rule]["rate_hi"]


def test_sample_is_deterministic_and_scales_up(spark, corpus):
    plan = SparkCompiler().compile(schema())

    def run():
        return sorted(
            (r["rule_id"], r["n_sample"], r["n_viol"], r["est_violations"])
            for r in sampled_violation_rates(
                corpus, plan, fraction=0.5, id_cols=["doc_id"]).collect())

    a, b = run(), run()
    assert a == b                                   # bit-identical re-run
    # the sample is exactly the md5-threshold subset
    thr = fraction_threshold(0.5)
    n_expect = corpus.filter(
        hash_prefix("doc_id") < F.lit(thr)).count()
    assert a[0][1] == n_expect
    # scale-up estimate = n_viol / fraction
    for _, _, n_viol, est in a:
        assert est == round(n_viol / 0.5)


def test_true_rate_inside_interval_at_half_sample(spark, corpus):
    plan = SparkCompiler().compile(schema())
    out = {r["rule_id"]: r for r in
           sampled_violation_rates(corpus, plan, fraction=0.5,
                                   id_cols=["doc_id"]).collect()}
    # true rates: 0.1 and 0.06 — a 95% interval on a ~200-row sample
    # must cover them (deterministic sample, so this is a fixed fact)
    assert out["n_chars.max"]["rate_lo"] <= 0.1 <= out["n_chars.max"]["rate_hi"]
    r = out["lang.required"]
    assert r["rate_lo"] <= 24 / 400 <= r["rate_hi"]


def test_zero_violation_rule_absent_but_bound_computable(spark):
    # a clean corpus produces zero rows (no rules fired) — the caller
    # reads "absent rule == 0 observed"; wilson_bounds(0, n) still gives
    # the rule-of-three-style upper bound for reporting
    from validr_spark.operators.audit import wilson_bounds
    df = spark.range(1).select(F.lit(0).alias("k"), F.lit(1000).alias("n"))
    lo, hi = wilson_bounds(F.col("k"), F.col("n"))
    row = df.select(F.round(lo, 6).alias("lo"),
                    F.round(hi, 6).alias("hi")).first()
    assert row["lo"] == 0.0
    rlo, rhi = ref_wilson(0, 1000)
    assert row["hi"] == pytest.approx(round(rhi, 6), abs=1e-6)
    assert 0.001 < row["hi"] < 0.01


def test_empty_sample_yields_null_rates_not_error(spark):
    # empty input (or a fraction too small to catch a row) + an explicit
    # rule inventory: NULL rate/bounds, not an ANSI DIVIDE_BY_ZERO
    from validr_spark.compiler import SparkCompiler
    from validr_spark.operators.audit import sampled_violation_rates
    from validr_spark.schema import T

    df = spark.createDataFrame([], "doc_id string, n long")
    plan = SparkCompiler().compile(T.dict(n=T.int.max(5)))
    rows = sampled_violation_rates(
        df, plan, fraction=0.5, id_cols=["doc_id"],
        rules=["n.max"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_sample"] == 0 and r["n_viol"] == 0
    assert r["rate"] is None and r["rate_lo"] is None \
        and r["rate_hi"] is None


# --- violation_triage --------------------------------------------------------

def _viol_df(spark):
    rows = ([("a", "lang.enum", "'zz'")] * 7
            + [("b", "lang.enum", "'xx'")] * 2
            + [("c", "lang.enum", "'yy'")] * 2
            + [("d", "lang.enum", "'qq'")] * 1
            + [("e", "n_chars.max", "999")] * 3
            + [("f", "n_chars.required", None)] * 2)
    return spark.createDataFrame(
        [(str(i), rule, val) for i, (_, rule, val) in enumerate(rows)],
        "doc_id string, rule_id string, value string")


def test_triage_topk_counts_and_shares(spark):
    from validr_spark.operators.audit import violation_triage
    v = _viol_df(spark)
    got = {(r["rule_id"], r["rank"]): r
           for r in violation_triage(v, k=2).collect()}
    assert got[("lang.enum", 1)]["value"] == "'zz'"
    assert got[("lang.enum", 1)]["n"] == 7
    assert got[("lang.enum", 1)]["share"] == round(7 / 12, 6)
    # tie between 'xx' and 'yy' (2 each) broken by value asc
    assert got[("lang.enum", 2)]["value"] == "'xx'"
    assert ("lang.enum", 3) not in got                  # k=2 cut
    assert got[("n_chars.max", 1)]["n"] == 3
    assert got[("n_chars.max", 1)]["share"] == 1.0
    # NULL value is a rankable value
    assert got[("n_chars.required", 1)]["value"] is None


def test_triage_salted_equals_unsalted(spark):
    from validr_spark.operators.audit import violation_triage
    v = _viol_df(spark)
    plain = sorted(map(tuple, violation_triage(v, k=3).collect()))
    salted = sorted(map(tuple, violation_triage(v, k=3, salt=8).collect()))
    assert plain == salted


def test_triage_null_sorts_first_on_tie(spark):
    from validr_spark.operators.audit import violation_triage
    v = spark.createDataFrame(
        [("1", "r", None), ("2", "r", "a")],
        "doc_id string, rule_id string, value string")
    got = violation_triage(v, k=2).orderBy("rank").collect()
    assert got[0]["value"] is None and got[0]["rank"] == 1
    assert got[1]["value"] == "a"


def test_clean_rules_inventory_rows(spark):
    """rules=[...] surfaces zero-violation rules with the rule-of-three
    upper bound instead of silently omitting them."""
    df = spark.createDataFrame([(i, 50, "en") for i in range(200)],
                               "doc_id long, n_chars int, lang string")
    plan = SparkCompiler().compile(schema())
    out = {r["rule_id"]: r for r in sampled_violation_rates(
        df, plan, fraction=1.0, id_cols=["doc_id"],
        rules=["n_chars.max", "lang.enum"]).collect()}
    assert set(out) == {"n_chars.max", "lang.enum"}
    for r in out.values():
        assert r["n_viol"] == 0 and r["rate"] == 0.0 and r["rate_lo"] == 0.0
        lo, hi = ref_wilson(0, 200)
        assert r["rate_hi"] == pytest.approx(round(hi, 6), abs=1e-6)
        assert r["est_violations"] == 0


def test_triage_scans_violations_once(spark):
    """The rollup serves both granularities from ONE scan: in the final
    adaptive plan the per-rule-totals branch must reuse the rollup's
    exchange instead of re-aggregating the violations.  (The INITIAL
    plan shows two scans — exchange reuse is resolved at runtime, so the
    assertion must read the executed final plan.)"""
    v = _viol_df(spark)
    from validr_spark.operators.audit import violation_triage
    df = violation_triage(v, k=2)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final, final
    scans = final.count("LocalTableScan") + final.count("Scan ExistingRDD")
    assert scans == 1, final
