"""Streaming gap-session aggregation — the Structured Streaming analogue
of the batch ``operators.temporal.sessionize``.

Uses Spark's native ``session_window`` (dynamic-gap event-time windows):
the state store merges/extends a user's open session as micro-batches
arrive and drops it once the watermark passes ``last_event + gap`` —
bounded state per active user no matter how long the stream runs.  This
is the idiomatic scale path; the batch operator exists for bounded
re-processing where exact per-event session ids are needed.

Semantics vs batch: same strict-gap grouping (an event exactly ``gap``
after the previous one joins the SAME session — session_window closes
only when the next event is *beyond* start+gap), so per-session event
counts agree with ``temporal.session_stats`` on the same bounded input
(pinned by test_streaming_sessions_match_batch).  The window *end*
differs by construction: ``session_window.end = last_event + gap``,
while batch ``end_ts`` is the last event itself.

No counterpart in guyskk/validr (no streams in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_sessions"]


def streaming_sessions(sdf: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts", gap: str = "30 minutes",
                       watermark: str = "1 hour",
                       extra_aggs: list | None = None) -> DataFrame:
    """Per-(user, session) rollup stream: n_events, start/end of the
    session window.  Append mode emits one final row per session once the
    watermark closes it; update mode emits running rollups.

    ``extra_aggs``: additional aggregate Columns (e.g.
    ``F.sum("value").alias("total_value")``) folded into the same
    stateful aggregation — one state store, no second shuffle.
    """
    win = F.session_window(F.col(ts_col), gap)
    aggs = [F.count(F.lit(1)).alias("n_events")] + list(extra_aggs or [])
    out = (sdf.withWatermark(ts_col, watermark)
           .groupBy(win.alias("session"), F.col(user_col))
           .agg(*aggs))
    rest = [c for c in out.columns if c not in ("session", user_col)]
    return out.select(user_col,
                      F.col("session.start").alias("start_ts"),
                      F.col("session.end").alias("end_ts"),
                      *rest)
