"""Temporal operators for event/log pipelines: gap-based sessionization
and as-of (most-recent-match) joins.

Spark has no native ASOF JOIN (DuckDB/pandas do); the standard distributed
formulation used here is union + partitioned window with
``last(..., ignoreNulls=True)``:

* ONE shuffle, on the join keys — both inputs co-partition once, and the
  per-key work is a linear merge over the time-sorted union.  No range
  join (O(n·m) per key), no per-row Python, no driver-side state.
* Skew behavior matches sessionization: the unit of work is one key's
  timeline, so the operator scales to any number of keys; a single
  pathological key (one user with 10^9 events) is the same irreducible
  hot partition it would be in any engine's ASOF implementation.

Sessionization is the same shape (partitioned window, running sum over a
gap flag), which is why both live in this module.

No counterpart in the reference (guyskk/validr validates single rows);
these are the event-pipeline operators of the brief's distributed layer.
Cross-engine semantics note: `asof_join(direction='backward')` matches
DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`` (inclusive
on equal timestamps) — the `asof_clicks` oracle query pins this parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "asof_join", "epoch_seconds",
           "resample"]


def epoch_seconds(df: DataFrame, ts_col: str) -> Column:
    """Epoch seconds (with microsecond fraction) for a timestamp /
    timestamp_ntz / numeric column — `unix_micros / 1e6`, the exact
    arithmetic DuckDB's `epoch_us(ts)/1000000.0` performs, so gap and
    duration math is bit-identical cross-engine.  NTZ values are
    interpreted in the session timezone (keep sessions UTC); gap/duration
    *differences* are timezone-shift invariant either way."""
    from pyspark.sql import types as st

    dt = df.schema[ts_col].dataType
    c = F.col(ts_col)
    if isinstance(dt, st.TimestampNTZType):
        c = c.cast("timestamp")
        dt = st.TimestampType()
    if isinstance(dt, st.TimestampType):
        return F.unix_micros(c) / F.lit(1000000.0)
    return c.cast("double")


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: int = 1800,
               session_col: str = "session_id") -> DataFrame:
    """Assign a session id per (user, activity burst): a new session starts
    whenever the gap to the user's previous event exceeds ``gap_seconds``.

    Classic two-window formulation — flag session starts with ``lag``,
    running-sum the flags — over ONE shuffle on ``user_col``; both windows
    share the same partitioning/ordering so Catalyst evaluates them in a
    single Window physical node.  The session id
    ``<user>-<seq>`` is deterministic and stable across runs.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts = epoch_seconds(df, ts_col)
    prev = F.lag(ts).over(w)
    new_sess = (prev.isNull() | (ts - prev > gap_seconds)).cast("long")
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sid = F.concat_ws("-", F.col(user_col).cast("string"),
                      seq.cast("string"))
    return df.withColumn(session_col, sid)


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_seconds: int = 1800,
                  session_col: str = "session_id") -> DataFrame:
    """Per-session rollup (events, start/end, duration).  The sessionize
    window and this groupBy share the ``user_col`` hash partitioning, so
    AQE reuses the exchange — one shuffle total."""
    s = sessionize(df, user_col, ts_col, gap_seconds, session_col)
    ts = F.col(ts_col)
    sec = epoch_seconds(df, ts_col)
    return (s.groupBy(user_col, session_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts).alias("start_ts"),
                 F.max(ts).alias("end_ts"),
                 (F.max(sec) - F.min(sec)).alias("duration_sec")))


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              ts_col: str, *, cols: list[str] | None = None,
              tolerance_seconds: float | None = None,
              suffix: str = "_right",
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the matching right row with the same
    key by timestamp:

    - ``direction='backward'`` (default): most recent right row with
      ``right.ts <= left.ts`` (inclusive — DuckDB ASOF parity);
    - ``'forward'``: earliest right row with ``right.ts >= left.ts``
      (inclusive) — "next reading after the event";
    - ``'nearest'``: whichever of the two is closer in time, ties to
      backward (pandas ``merge_asof`` convention).

    Unmatched (or out-of-tolerance) left rows keep NULLs, like a left
    join.  ``cols``: right columns to carry (default: everything except
    keys and ``ts_col``); they come back suffixed.  ``<ts_col><suffix>``
    is always included so callers can compute the match lag.

    Implementation: tag sides, union, and take
    ``last(right_value, ignoreNulls=True)`` over a key-partitioned window
    ordered by (ts, side) — right-before-left on timestamp ties gives the
    inclusive semantics; forward is the same merge over the reversed
    ordering.  ``nearest`` evaluates both windows over the SAME
    union/partitioning (one shuffle, two in-partition sorts) and picks
    per row.  See module docstring for the scale argument.
    """
    on = [on] if isinstance(on, str) else list(on)
    if cols is None:
        cols = [c for c in right.columns if c not in on and c != ts_col]
    out_cols = {c: c + suffix for c in cols}
    rts = ts_col + suffix

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_cols[c])
          for c in cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(rts),
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != ts_col],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(out_cols[c]) for c in cols],
        F.col(ts_col).alias(rts),
    ).select(*lhs.columns)              # positional parity for union

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward or nearest")
    u = lhs.unionByName(rhs)
    w_back = (Window.partitionBy(*on)
              .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy(*on)
             .orderBy(F.col(ts_col).desc(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        filled = u.select(
            *[F.col(c) for c in left.columns],
            F.col("_side"),
            *[F.last(out_cols[c], ignorenulls=True).over(w)
              .alias(out_cols[c]) for c in cols],
            F.last(rts, ignorenulls=True).over(w).alias(rts),
        ).filter(F.col("_side") == 1).drop("_side")
    else:
        both = u.select(
            *[F.col(c) for c in left.columns],
            F.col("_side"),
            *[F.last(out_cols[c], ignorenulls=True).over(w_back)
              .alias(out_cols[c] + "_b") for c in cols],
            F.last(rts, ignorenulls=True).over(w_back).alias(rts + "_b"),
            *[F.last(out_cols[c], ignorenulls=True).over(w_fwd)
              .alias(out_cols[c] + "_f") for c in cols],
            F.last(rts, ignorenulls=True).over(w_fwd).alias(rts + "_f"),
        ).filter(F.col("_side") == 1).drop("_side")
        lag_b = (epoch_seconds(both, ts_col)
                 - epoch_seconds(both, rts + "_b"))
        lag_f = (epoch_seconds(both, rts + "_f")
                 - epoch_seconds(both, ts_col))
        use_b = (F.col(rts + "_f").isNull()
                 | (F.col(rts + "_b").isNotNull() & (lag_b <= lag_f)))
        filled = both.select(
            *[F.col(c) for c in left.columns],
            *[F.when(use_b, F.col(out_cols[c] + "_b"))
              .otherwise(F.col(out_cols[c] + "_f")).alias(out_cols[c])
              for c in cols],
            F.when(use_b, F.col(rts + "_b"))
            .otherwise(F.col(rts + "_f")).alias(rts))

    if tolerance_seconds is not None:
        lag = epoch_seconds(filled, ts_col) - epoch_seconds(filled, rts)
        if direction == "forward":
            lag = -lag
        elif direction == "nearest":
            lag = F.abs(lag)
        keep: Column = F.col(rts).isNotNull() & (lag <= tolerance_seconds)
        filled = filled.select(
            *[F.col(c) for c in left.columns],
            *[F.when(keep, F.col(out_cols[c])).alias(out_cols[c])
              for c in cols],
            F.when(keep, F.col(rts)).alias(rts),
        )
    return filled


def resample(df: DataFrame, ts_col: str = "ts",
             interval_seconds: int = 3600, key_col: str | None = None,
             value_col: str | None = None, fill: bool = True,
             max_buckets_per_key: int = 1_000_000) -> DataFrame:
    """Fixed-interval time-series rollup with gap filling: one row per
    (key, bucket_start) between each key's first and last event —
    including EMPTY buckets (n_events=0) — so downstream rate monitors,
    anomaly scans (operators/anomaly.py) and charts never mistake
    "no data" for "no row".

    Columns: key (if ``key_col``), ``bucket`` (epoch-seconds bucket
    start), ``n_events``, ``sum_value`` (if ``value_col``; stays NULL in
    empty buckets — an absent measurement is not a zero measurement).

    Shape at scale: one hash-agg on (key, bucket) — the shuffle carries
    active (key, bucket) pairs, not events; the gap spine is a per-key
    ``sequence()`` explode off a key-sized min/max aggregate (re-using
    the same hash partitioning), joined back on (key, bucket) —
    key-sized inputs on both sides, never the corpus.  A key whose span
    would exceed ``max_buckets_per_key`` buckets fails fast with
    ``raise_error`` instead of silently exploding the spine (a sensor
    with one 1970 timestamp and a 1-second interval is a 10^9-row
    spine); raise the cap or pre-filter outlier timestamps.
    """
    step = int(interval_seconds)
    e = epoch_seconds(df, ts_col)
    b = (F.floor(e / step) * step).cast("long")
    keys = [key_col] if key_col else []
    cols = [*keys, b.alias("bucket")]
    if value_col:
        cols.append(F.col(value_col).alias("_v"))
    src = df.filter(F.col(ts_col).isNotNull()).select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum("_v").alias("sum_value"))
    counts = src.groupBy(*keys, "bucket").agg(*aggs)
    if not fill:
        return counts
    span = counts.groupBy(*keys).agg(F.min("bucket").alias("_lo"),
                                     F.max("bucket").alias("_hi"))
    n_buckets = (F.col("_hi") - F.col("_lo")) / step + 1
    seq = F.when(
        n_buckets <= max_buckets_per_key,
        F.sequence("_lo", "_hi", F.lit(step).cast("long"))
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"resample: key span exceeds {max_buckets_per_key} "
              f"buckets at interval {step}s: "),
        F.concat_ws(" ", *keys) if keys else F.lit("(global)"))))
    spine = span.select(*keys, F.explode(seq).alias("bucket"))
    out = (spine.join(counts, [*keys, "bucket"], "left")
           .withColumn("n_events", F.coalesce("n_events", F.lit(0))))
    return out.orderBy(*keys, "bucket") if keys else out.orderBy("bucket")
