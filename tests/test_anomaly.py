"""Metric anomaly detection over manifest run history."""
import pytest
from pyspark.sql import functions as F

from validr_spark.operators.anomaly import metric_anomalies


def _manifest(spark, series, part="a"):
    """series: list of (n_rows, n_bad_rows, n_violations) per run."""
    rows = [(part, float(i), n, b, v)
            for i, (n, b, v) in enumerate(series)]
    return spark.createDataFrame(
        rows, "part string, finished_at double, n_rows long, "
              "n_bad_rows long, n_violations long")


def test_zscore_flags_volume_drop(spark):
    series = [(1000, 1, 2)] * 6 + [(400, 1, 2)]     # volume falls 60%
    out = metric_anomalies(_manifest(spark, series)).collect()
    by = {(r["finished_at"], r["metric"]): r for r in out}
    last = by[(6.0, "n_rows")]
    assert last["is_anomaly"] is True               # constant history, jump
    assert by[(6.0, "n_violations")]["is_anomaly"] is False
    # first runs: insufficient history -> NULL flag
    assert by[(0.0, "n_rows")]["is_anomaly"] is None
    assert by[(2.0, "n_rows")]["is_anomaly"] is None


def test_zscore_tolerates_noise(spark):
    series = [(1000 + d, 5, 10) for d in (0, 7, -4, 3, -6, 5, 2)]
    out = metric_anomalies(_manifest(spark, series)).collect()
    flagged = [r for r in out if r["is_anomaly"]]
    assert flagged == []


def test_rel_change_method(spark):
    series = [(1000, 10, 20)] * 5 + [(1000, 10, 220)]   # violations 11x
    out = metric_anomalies(_manifest(spark, series),
                           method="rel_change", threshold=0.5).collect()
    last = {r["metric"]: r for r in out if r["finished_at"] == 5.0}
    assert last["n_violations"]["is_anomaly"] is True
    assert last["n_violations"]["score"] == 10.0        # 220/20 - 1
    assert last["n_rows"]["is_anomaly"] is False


def test_history_is_per_partition(spark):
    a = _manifest(spark, [(1000, 0, 0)] * 5, part="a")
    b = _manifest(spark, [(10, 0, 0)] * 5, part="b")
    out = metric_anomalies(a.unionByName(b)).collect()
    # b's small volume is normal FOR B — no cross-partition contamination
    assert not any(r["is_anomaly"] for r in out if r["is_anomaly"])


def test_anomalous_run_does_not_poison_its_baseline(spark):
    # the spike at run 5 must not raise the baseline used to judge run 6
    series = [(1000, 0, 0)] * 5 + [(5000, 0, 0), (1000, 0, 0)]
    out = metric_anomalies(_manifest(spark, series), threshold=2.0).collect()
    rows = {r["finished_at"]: r for r in out if r["metric"] == "n_rows"}
    assert rows[5.0]["is_anomaly"] is True
    # run 6 is back to normal; its baseline mean includes the spike but
    # the strictly-preceding frame means run 5 judged itself against
    # clean history — and run 6 must not be flagged as anomalous low
    assert rows[6.0]["is_anomaly"] is False


def test_bad_method_rejected(spark):
    with pytest.raises(ValueError, match="unknown method"):
        metric_anomalies(_manifest(spark, [(1, 1, 1)]), method="mad")


def test_gate_uses_raw_score_not_rounded(spark):
    # raw rel-change score 0.50000004 exceeds threshold 0.5 but ROUNDS
    # to exactly 0.5 at the 6-decimal report precision — the gate must
    # fire anyway (flag computed from the raw score, rounding is
    # display-only)
    series = [(1, 1, 100000000)] * 5 + [(1, 1, 150000004)]
    out = metric_anomalies(_manifest(spark, series),
                           method="rel_change", threshold=0.5).collect()
    last = {r["metric"]: r for r in out if r["finished_at"] == 5.0}
    assert last["n_violations"]["score"] == 0.5       # rounded report
    assert last["n_violations"]["is_anomaly"] is True  # raw-score gate
