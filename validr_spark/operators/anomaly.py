"""Metric anomaly detection over validation-run history.

Every resumable run appends per-partition rows (n_rows, n_bad_rows,
n_violations, verdict, finished_at) to the manifest table
(plans/manifest.py).  This module turns that history into alerts: a
partition whose metrics jump relative to ITS OWN history is flagged even
when it still passes its absolute thresholds — the "volume fell 40%
overnight" / "violation rate crept 10× in a week" class of failure that
fixed bounds miss.

Methods (all windowed per partition key, one shuffle on the key):

* ``zscore``     — |x − mean(history)| / stddev(history); robust default
  for roughly-stationary metrics.
* ``rel_change`` — |x / median(history) − 1|; unit-free, catches level
  shifts on metrics whose scale differs per partition.

Both use ONLY rows strictly earlier than the evaluated run (watermarked
by ``finished_at``), so an anomalous new run cannot poison its own
baseline.  History is bounded by ``lookback`` runs — the window frame
Spark materializes per key is O(lookback), never the full history.

Scale: the manifest has one row per (partition × run) — even 10^5 parts
× 10^3 runs is 10^8 tiny rows, trivially shuffled on the part key.  The
operator is deliberately exact (no sketches): it runs over metadata,
not data.

Reference: no counterpart in guyskk/validr (no run history there);
design follows the metric-repository + anomaly-check shape popularized
by Deequ's MetricsRepository/AnomalyDetection (public AWSLabs project).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["metric_anomalies"]

_METRICS = ["n_rows", "n_bad_rows", "n_violations"]


def metric_anomalies(manifest: DataFrame,
                     metrics: list[str] | None = None,
                     key_col: str = "part",
                     order_col: str = "finished_at",
                     method: str = "zscore",
                     threshold: float = 3.0,
                     min_history: int = 3,
                     lookback: int = 50) -> DataFrame:
    """Flag metric values that deviate from the same partition's history.

    Returns one row per (key, run, metric) with history stats and an
    ``is_anomaly`` flag; rows with fewer than ``min_history`` prior runs
    are emitted with ``is_anomaly = NULL`` (insufficient baseline).

    ``method``: 'zscore' (threshold = max |z|, default 3.0) or
    'rel_change' (threshold = max |x/median − 1|, e.g. 0.5 = ±50%).
    """
    metrics = list(metrics or _METRICS)
    if method not in ("zscore", "rel_change"):
        raise ValueError(f"unknown method {method!r}; "
                         "use 'zscore' or 'rel_change'")

    # long format first: (key, order, metric, value)
    stacked = manifest.select(
        F.col(key_col).alias("key"), F.col(order_col).alias("ord"),
        F.explode(F.map_from_arrays(
            F.array(*[F.lit(m) for m in metrics]),
            F.array(*[F.col(m).cast("double") for m in metrics]),
        )).alias("metric", "value"))

    # history = previous `lookback` runs of the SAME (key, metric),
    # strictly before the current row
    w = (Window.partitionBy("key", "metric").orderBy("ord")
         .rowsBetween(-lookback, -1))
    hist_n = F.count("value").over(w)
    if method == "zscore":
        mean = F.avg("value").over(w)
        sd = F.stddev_samp("value").over(w)
        # sd == 0 (constant history): any change is infinitely surprising;
        # use the value delta itself so a first deviation still flags.
        score = F.when(sd > 0, F.abs((F.col("value") - mean) / sd)) \
                 .otherwise(F.when(F.col("value") == mean, F.lit(0.0))
                            .otherwise(F.lit(float("inf"))))
        baseline = mean
    else:
        baseline = F.expr(
            f"percentile(value, 0.5) OVER (PARTITION BY key, metric "
            f"ORDER BY ord ROWS BETWEEN {lookback} PRECEDING "
            f"AND 1 PRECEDING)")
        score = F.when(baseline != 0,
                       F.abs(F.col("value") / baseline - 1)) \
                 .otherwise(F.when(F.col("value") == 0, F.lit(0.0))
                            .otherwise(F.lit(float("inf"))))

    # gate on the RAW score — rounding is display-only.  A score of
    # 3.0000004 under threshold 3.0 must flag; comparing the rounded
    # `score` column would silently pass it (the drift_gate/CheckSuite
    # pre-rounded-gate defect class, one layer further out).
    flag = (F.when(hist_n < min_history, F.lit(None).cast("boolean"))
            .otherwise(score > float(threshold)))
    return stacked.select(
        F.col("key").alias(key_col), F.col("ord").alias(order_col),
        "metric", "value",
        F.round(baseline, 6).alias("baseline"),
        hist_n.alias("n_history"),
        F.round(score, 6).alias("score"),
        flag.alias("is_anomaly"),
    )
