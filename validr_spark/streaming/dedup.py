"""Streaming deduplication — exact-fingerprint dedup over an unbounded
stream with bounded state.

The batch analogue is ``operators.dedup.exact_dedup`` (hash-groupBy over
the whole table); a stream cannot hold every fingerprint ever seen, so
state must be bounded by event time:

* ``dedup_stream``            — ``dropDuplicatesWithinWatermark`` keyed on
  the content fingerprint: keeps ONE row per fingerprint among events
  whose event times fall within the watermark horizon, and evicts state
  once the watermark passes.  This is the idiomatic Structured Streaming
  primitive — the state store holds only fingerprints newer than
  ``watermark``, so state is O(arrival rate × horizon), independent of
  stream age.  Exactly the shape a 10^12-row ingest dedup needs: the
  horizon is the dedup contract ("no duplicate within 24h"), not an
  implementation detail.
* ``duplicate_counts_stream``  — windowed duplicate accounting (how many
  copies of each fingerprint per event-time window) for monitoring, via a
  watermarked windowed count with the same bounded-state property.

Global historical dedup at scale is a batch join against the accumulated
fingerprint table (see operators.dedup), not stream state — combining
the two (stream for the hot horizon, nightly batch anti-join for the
cold past) is the standard lambda shape.

No counterpart in guyskk/validr (no streams in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validr_spark.operators.dedup import normalize_text

__all__ = ["with_fingerprint", "dedup_stream", "duplicate_counts_stream"]


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """xxhash64 of the normalized text — JVM-side, codegen; works on both
    batch and streaming DataFrames."""
    return df.withColumn(out_col, F.xxhash64(normalize_text(F.col(text_col))))


def dedup_stream(sdf: DataFrame, key_cols: list[str] | None = None,
                 ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """Keep the first-seen row per key within the watermark horizon.

    State: one entry per distinct key with event time newer than the
    watermark; evicted automatically.  Works in append mode with any sink.
    """
    key_cols = list(key_cols or ["fingerprint"])
    return (sdf.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def duplicate_counts_stream(sdf: DataFrame, key_col: str = "fingerprint",
                            ts_col: str = "ts",
                            window: str = "5 minutes",
                            watermark: str = "10 minutes") -> DataFrame:
    """Per-window duplicate monitor: (window_start, key, n_copies) for
    keys seen more than once in the event-time window.  Bounded state:
    windows close at the watermark."""
    return (sdf.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_copies"))
            .filter(F.col("n_copies") > 1)
            .select(F.col("w.start").alias("window_start"),
                    key_col, "n_copies"))
