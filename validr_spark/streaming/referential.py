"""Streaming referential-integrity checks: stream-static anti-join.

The streaming twin of ``operators/referential.py``: the fact side is a
stream, the dimension is a static table.  Stream-static left-anti joins
are STATELESS in Structured Streaming — each micro-batch joins against
the (possibly re-read) static side, no join state accumulates — so the
orphan stream runs in append mode with exactly-once file sinks, and the
executor footprint is the same as the batch check at any stream length.

With ``broadcast=True`` (default, for the small source/enum dimension of
the north-rule table) the join is map-side per micro-batch: zero shuffle
of the stream.  For a large dimension pass ``broadcast=False`` and let
AQE pick the strategy per micro-batch.

Note the static side is re-planned each micro-batch: a dimension backed
by a table reflects updates between batches (documented Structured
Streaming semantics), which is usually exactly what a slowly-changing
allow-list wants.  Cache the dimension DataFrame to pin a snapshot.

No counterpart in guyskk/validr (no streams, no joins in the reference);
the semantics preserved are the batch check's: a fact row is an orphan
iff its key has no match in the dimension at micro-batch time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validr_spark.operators.referential import orphans

__all__ = ["stream_orphans", "windowed_orphan_counts"]


def stream_orphans(fact_stream: DataFrame, dim: DataFrame, on,
                   broadcast: bool = True) -> DataFrame:
    """Streaming rows whose key has no match in the static dimension.

    Stateless stream-static LEFT ANTI join → append-mode compatible."""
    return orphans(fact_stream, dim, on, broadcast=broadcast)


def windowed_orphan_counts(fact_stream: DataFrame, dim: DataFrame, on,
                           ts_col: str, window: str = "1 minute",
                           watermark: str = "5 minutes",
                           broadcast: bool = True) -> DataFrame:
    """Per event-time window orphan counts: the join stays stateless; the
    only state is the watermarked window aggregation, dropped once the
    watermark passes each window's end (bounded state forever)."""
    o = stream_orphans(fact_stream.withWatermark(ts_col, watermark),
                       dim, on, broadcast=broadcast)
    return (o.groupBy(F.window(F.col(ts_col), window).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "n_orphans"))
