"""Table-level CheckSuite: one-pass aggregation, verdicts, plan shape."""
import pytest
from pyspark.sql import functions as F

from validr_spark.operators.checks import Check, CheckSuite


@pytest.fixture(scope="module")
def df(spark):
    rows = [(f"d{i:04d}",
             None if i % 20 == 0 else f"text {'x' * (i % 50)}",
             i % 7,
             ["en", "zh", "de"][i % 3] if i % 11 else "xx")
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id string, text string, "
                                       "n int, lang string")


def test_suite_report_and_verdict(spark, df):
    suite = CheckSuite("gate", [
        Check.row_count(min=100, max=10_000),
        Check.null_rate("text", max=0.10),
        Check.min("n", ge=0),
        Check.max("n", le=6),
        Check.mean("n", between=(2.0, 4.0)),
        Check.unique_ratio("doc_id", min=0.99),
        Check.values_in("lang", ["en", "zh", "de"], min_ratio=0.95),
        Check.matches("doc_id", r"d\d{4}", min_ratio=1.0),
        Check.satisfies("n < 100", min_ratio=1.0, name="n_small"),
    ])
    rep = suite.run(df)
    rows = {r["check_id"]: r for r in rep.collect()}
    assert len(rows) == 9
    assert rows["row_count"]["observed"] == 200.0
    assert rows["row_count"]["passed"]
    assert rows["null_rate(text)"]["observed"] == 0.05
    assert rows["min(n)"]["passed"] and rows["max(n)"]["passed"]
    assert rows["mean(n)"]["passed"]          # mean = 3.0 - 7/200 drift
    assert rows["matches(doc_id)"]["passed"]
    assert rows["n_small"]["passed"]
    assert CheckSuite.verdict(rep) == all(r["passed"] for r in rows.values())


def test_failures_carry_messages(spark, df):
    suite = CheckSuite("strict", [
        Check.row_count(min=1000),
        Check.null_rate("text", max=0.01),
        Check.values_in("lang", ["en"], min_ratio=0.99),
    ])
    rep = suite.run(df)
    rows = {r["check_id"]: r for r in rep.collect()}
    assert not rows["row_count"]["passed"]
    assert rows["row_count"]["message"].startswith(
        "expect row_count in [1000.0, +inf], but 200")
    assert not rows["null_rate(text)"]["passed"]
    assert not CheckSuite.verdict(rep)
    # passing checks carry a null message
    ok = CheckSuite("ok", [Check.row_count(min=1)]).run(df).first()
    assert ok["message"] is None


def test_empty_input_fails_bounded_checks(spark, df):
    empty = df.limit(0)
    rep = CheckSuite("e", [
        Check.row_count(min=1),
        Check.min("n", ge=0),            # null observed -> fail, not pass
    ]).run(empty)
    rows = {r["check_id"]: r for r in rep.collect()}
    assert not rows["row_count"]["passed"]
    assert not rows["min(n)"]["passed"]
    assert rows["min(n)"]["observed"] is None


def test_exact_variants_match_duckdb_semantics(spark, df):
    import duckdb
    pdf = df.toPandas()
    rep = CheckSuite("x", [
        Check.unique_ratio("lang", min=0.0, exact=True),
        Check.quantile("n", 0.5, between=(0, 6), exact=True),
        Check.stddev("n", le=10.0),
    ]).run(df)
    rows = {r["check_id"]: r for r in rep.collect()}
    con = duckdb.connect()
    con.register("t", pdf)
    uniq, med, sd = con.execute(
        "SELECT count(DISTINCT lang)::double / count(lang), "
        "quantile_cont(n, 0.5), stddev_pop(n) FROM t").fetchone()
    assert rows["unique_ratio(lang,exact)"]["observed"] == round(uniq, 6)
    assert rows["q0.5(n)"]["observed"] == round(med, 6)
    assert rows["stddev(n)"]["observed"] == round(sd, 6)


def test_single_pass_plan(spark, df):
    """The whole suite is ONE aggregate over ONE scan (modulo the exact
    count_distinct expand) — no join, no repeated scans."""
    suite = CheckSuite("g", [
        Check.row_count(min=1), Check.null_rate("text", max=1.0),
        Check.mean("n", between=(0, 10)),
        Check.unique_ratio("doc_id", min=0.0),   # approx (HLL) path
    ])
    plan = suite.run(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2          # partial+final, one agg
    assert "Join" not in plan


def test_duplicate_check_ids_rejected(spark):
    with pytest.raises(ValueError, match="duplicate check_id"):
        CheckSuite("d", [Check.row_count(min=1), Check.row_count(max=2)])


def test_encoding_clean_ratio_check(spark):
    from validr_spark.operators.checks import Check, CheckSuite

    df = spark.createDataFrame(
        [("clean text",), ("lost � char",), ("moji Ã© here",), (None,)],
        "text string")
    suite = CheckSuite("enc", [Check.encoding_clean_ratio("text",
                                                          min_ratio=0.9)])
    rep = suite.run(df).collect()[0]
    # "clean text" is the only clean row of the 3 non-null ones
    assert rep["observed"] == pytest.approx(1 / 3, abs=1e-6)
    assert not rep["passed"]
    ok = CheckSuite("enc2", [Check.encoding_clean_ratio("text",
                                                        min_ratio=0.3)])
    assert CheckSuite.verdict(ok.run(df))


def test_array_finite_ratio_check(spark):
    from validr_spark.operators.checks import Check, CheckSuite

    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [nan, 1.0]), (3, [inf, 1.0]),
         (4, [1.0, None]), (5, None), (6, [-1.0, 0.5])],
        "id long, e array<float>")
    suite = CheckSuite("fin", [Check.array_finite_ratio("e", min_ratio=0.9)])
    rep = suite.run(df).collect()[0]
    assert rep["observed"] == pytest.approx(2 / 5, abs=1e-6)
    assert not rep["passed"]


def test_new_checks_stay_single_pass(spark):
    from validr_spark.operators.checks import Check, CheckSuite

    df = spark.createDataFrame([("x", [1.0])], "text string, e array<float>")
    suite = CheckSuite("mix", [
        Check.row_count(min=1),
        Check.encoding_clean_ratio("text"),
        Check.array_finite_ratio("e"),
    ])
    plan = suite.run(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2
    assert "Join" not in plan


def test_drift_gate_pass_fail_and_union(spark):
    from validr_spark.operators.checks import Check, CheckSuite, drift_gate
    ref = spark.createDataFrame(
        [(float(i), "a" if i % 2 else "b") for i in range(100)],
        "v double, c string")
    same = spark.createDataFrame(
        [(float(i), "a" if i % 2 else "b") for i in range(100)],
        "v double, c string")
    rep = drift_gate(ref, same, numeric_cols=["v"], cat_cols=["c"])
    assert CheckSuite.verdict(rep) is True
    shifted = same.withColumn("v", F.col("v") + 500)
    rep2 = drift_gate(ref, shifted, numeric_cols=["v"], cat_cols=["c"],
                      max_psi=0.25)
    rows = {r["check_id"]: r for r in rep2.collect()}
    assert rows["drift_psi"]["passed"] is False
    assert "expect psi <=" in rows["drift_psi"]["message"]
    assert rows["drift_jsd"]["passed"] is True
    # vanished data FAILS, never silently passes
    empty = spark.createDataFrame([], "v double, c string")
    rep3 = drift_gate(ref, empty, numeric_cols=["v"])
    r3 = rep3.collect()[0]
    assert r3["passed"] is False and "no data" in r3["message"]
    # same schema as CheckSuite: the reports union and gate together
    suite = CheckSuite("s", [Check.row_count(min=1)]).run(same)
    combined = suite.unionByName(rep)
    assert CheckSuite.verdict(combined) is True


def test_drift_gate_bounds_raw_metric_not_rounded(spark):
    # ADVICE.md round-2 finding: gating on round(metric, 6) let a value
    # up to 5e-7 above the bound pass.  The gate must compare the RAW
    # metric; rounding is presentation-only.
    from validr_spark.operators.checks import drift_gate
    from validr_spark.operators.drift import psi_quantile
    ref = spark.createDataFrame([(float(i),) for i in range(200)],
                                "v double")
    new = spark.createDataFrame([(float(i) + 3,) for i in range(200)],
                                "v double")
    raw = psi_quantile(ref, new, "v", bins=10).collect()[0]["psi"]
    # bound a hair BELOW the raw value but ABOVE its 6-digit rounding
    # floor — a rounded-gate implementation would pass, the raw gate
    # must fail
    bound = raw - 2e-9
    rep = drift_gate(ref, new, numeric_cols=["v"], max_psi=bound)
    r = {x["check_id"]: x for x in rep.collect()}["drift_psi"]
    assert r["passed"] is False
    # and a bound a hair above the raw value passes
    rep2 = drift_gate(ref, new, numeric_cols=["v"], max_psi=raw + 2e-9)
    r2 = {x["check_id"]: x for x in rep2.collect()}["drift_psi"]
    assert r2["passed"] is True


def test_drift_gate_observed_never_contradicts_verdict(spark):
    """A metric a hair over the bound must FAIL *and* display an
    observed value over the bound: rounding 0.2500000002 to 6 digits
    shows exactly the bound next to passed=False, which reads as a
    harness bug (review finding, round 3)."""
    import math

    from validr_spark.operators.checks import drift_gate

    # engineer psi just above 0.25: two-bin split p=(0.5,0.5) vs
    # q=(0.5+d, 0.5-d) has psi ~ 4*d^2/... easier: scan d numerically
    def psi2(d):
        p, q = (0.5, 0.5), (0.5 + d, 0.5 - d)
        return sum((a - b) * math.log(a / b) for a, b in zip(p, q))

    lo, hi = 0.0, 0.49
    for _ in range(60):                      # bisect psi2(d) ~= bound+2e-9
        mid = (lo + hi) / 2
        if psi2(mid) < 0.25 + 2e-9:
            lo = mid
        else:
            hi = mid
    d = hi
    n = 200000
    k = int(round(n * (0.5 + d)))
    ref = spark.createDataFrame([(0.0,)] * (n // 2) + [(10.0,)] * (n // 2),
                                "x double")
    new = spark.createDataFrame([(0.0,)] * k + [(10.0,)] * (n - k),
                                "x double")
    rows = {r["check_id"]: r for r in
            drift_gate(ref, new, numeric_cols=["x"], max_psi=0.25,
                       bins=2).collect()}
    r = rows["drift_psi"]
    if not r["passed"]:                      # raw metric over the bound
        assert r["observed"] > r["hi"], (r["observed"], r["hi"])
    else:                                    # construction drifted under
        assert r["observed"] <= r["hi"]
