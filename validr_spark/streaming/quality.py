"""Streaming corpus-quality monitor: per-event-time-window encoding
hygiene over a live document stream.

The batch operator (operators/encoding.py) is a pure map-side projection,
so it composes with Structured Streaming for free: the per-class counts
ride ONE watermarked tumbling-window aggregation — state is
O(windows-in-flight), independent of stream volume, and every metric is
an algebraic sum, so partial aggregation happens before the window
shuffle.  Append mode → one row per closed window, exactly-once with a
checkpointed sink.

Alert shape: downstream filters ``clean_frac < threshold`` on the output
stream — a sudden mojibake burst from one crawler shows up within one
window + watermark delay.

No counterpart in guyskk/validr (synchronous single-value library).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_encoding_quality"]


def windowed_encoding_quality(sdf: DataFrame, ts_col: str,
                              text_col: str = "text",
                              window: str = "10 minutes",
                              watermark: str = "10 minutes") -> DataFrame:
    """Per-window encoding report of a streaming text column.

    Returns a streaming DataFrame (window_start, window_end, n_docs,
    docs_replacement, docs_control, docs_mojibake, docs_zero_width,
    total_bad_chars, clean_frac) in append mode.  Also runs on a batch
    DataFrame (same plan, the window is an ordinary expression).
    """
    from validr_spark.operators.encoding import (ENCODING_PATTERNS,
                                                 encoding_counts)

    e = encoding_counts(F.col(text_col))
    names = list(ENCODING_PATTERNS)
    total = None
    for n in names:
        total = e[n] if total is None else total + e[n]
    proj = sdf.select(F.col(ts_col),
                      *[e[n].alias(f"_c_{n}") for n in names],
                      total.alias("_tot"))
    if proj.isStreaming:
        proj = proj.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for n in names:
        aggs.append(F.sum((F.col(f"_c_{n}") > 0).cast("long"))
                    .alias(f"docs_{n}"))
    aggs.append(F.sum("_tot").alias("total_bad_chars"))
    aggs.append(F.round(F.avg((F.col("_tot") == 0).cast("double")), 6)
                .alias("clean_frac"))
    return (proj.groupBy(F.window(ts_col, window)).agg(*aggs)
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    "n_docs",
                    *[f"docs_{n}" for n in names],
                    "total_bad_chars", "clean_frac"))
