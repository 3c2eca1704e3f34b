"""Streaming drift monitor — per-event-time-window distribution checks
of a live stream against a STATIC reference histogram.

The production shape: the reference distribution (yesterday's good data,
the training corpus, a golden partition) is a tiny aggregated table,
broadcast to every task; the stream is windowed-counted and each closed
window is scored against the reference.  Two stateful operators chain in
append mode (Spark ≥3.4 multi-stateful support): windowed
count-per-category → per-window score aggregation.  The watermark bounds
both states, so state size is O(windows-in-flight × categories),
independent of stream volume.

The second aggregation collects the window's (category count, expected
share) pairs into an array — bounded by the category vocabulary, i.e.
monitoring-sized, NOT data-sized — and computes the exact chi-square
statistic in one expression, including the mass of baseline categories
the window never saw (their expected counts still count against it).
Stream categories absent from the baseline get a 0.5-count prior
(Haldane–Anscombe style) instead of a division by zero; they are exactly
the categories a drift monitor must not drop.

No counterpart in guyskk/validr (synchronous single-value library).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_category_drift"]


def windowed_category_drift(sdf: DataFrame, baseline: DataFrame,
                            ts_col: str, category_col: str,
                            window: str = "10 minutes",
                            watermark: str = "10 minutes",
                            threshold: float | None = None) -> DataFrame:
    """Per-window drift of a streaming category column vs a static
    baseline histogram ``baseline(category, n)``.

    Returns a streaming DataFrame (window_start, window_end, n_rows,
    n_categories, chi2[, drifted]) in append mode — one row per closed
    window.  ``chi2`` is Σ (obs−exp)²/exp over the union of window and
    baseline categories, with exp = baseline share × window total.
    Also usable on a batch DataFrame (same plan, no watermark state).
    """
    # the baseline TOTAL joins onto every window by a constant key (below),
    # NOT by riding the per-category join: a window whose categories all
    # miss the baseline would otherwise see t_base NULL and fall back to
    # 1.0 — understating chi2 most exactly when drift is total.
    base_tot = (baseline.agg(F.sum("n").cast("double").alias("t_base"))
                .withColumn("_one", F.lit(1)))
    base = baseline.select(F.col("category"),
                           F.col("n").cast("double").alias("n_base"))

    streaming = sdf.isStreaming
    src = sdf.withWatermark(ts_col, watermark) if streaming else sdf
    counts = (src.groupBy(F.window(F.col(ts_col), window).alias("w"),
                          F.col(category_col).alias("category"))
              .agg(F.count(F.lit(1)).alias("n_obs")))

    # left join keeps stream-only categories (n_base null → 0.5 prior
    # downstream); baseline-only categories are folded back in via the
    # unseen-mass term after the window aggregate.
    j = counts.join(F.broadcast(base), "category", "left")
    per_win = (j.groupBy("w")
               .agg(F.sum("n_obs").alias("n_rows"),
                    F.count(F.lit(1)).alias("n_categories"),
                    F.collect_list(
                        F.struct(F.col("n_obs").cast("double").alias("o"),
                                 F.col("n_base").alias("nb"))).alias("cats"))
               # constant-key stream-static equi-join: one broadcast row
               .withColumn("_one", F.lit(1))
               .join(F.broadcast(base_tot), "_one", "left")
               .withColumnRenamed("t_base", "tb")
               .drop("_one"))

    T = F.col("n_rows").cast("double")
    tb = F.coalesce(F.col("tb"),
                    F.lit(1.0))  # baseline empty → every share is prior
    esx = lambda x: F.coalesce(x["nb"], F.lit(0.5)) / tb  # noqa: E731
    seen_terms = F.aggregate(
        "cats", F.lit(0.0),
        lambda acc, x: acc + F.pow(x["o"] - esx(x) * T, 2) / (esx(x) * T))
    # baseline categories with zero observations this window: their
    # expected mass is (1 - sum of seen REAL baseline shares) * T and the
    # chi2 term for obs=0 is exactly exp.
    seen_base_share = F.aggregate(
        "cats", F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x["nb"] / tb, F.lit(0.0)))
    unseen_mass = F.greatest(F.lit(0.0), (F.lit(1.0) - seen_base_share)) * T
    chi2 = F.round(seen_terms + unseen_mass, 6)

    out = per_win.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_rows", "n_categories", chi2.alias("chi2"))
    if threshold is not None:
        out = out.withColumn("drifted", F.col("chi2") > F.lit(threshold))
    return out
