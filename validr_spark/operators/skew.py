"""Join/aggregation-key skew diagnostics — the pre-flight check before
shuffling 100 TB on a key.  A single hot key (null ids, empty strings,
default values) turns one reducer into the job's critical path; these
operators quantify that BEFORE the expensive job runs, and size the salt
factor for the mitigation.

Everything here is one explode-free hash aggregate on the key (map-side
partial combine, shuffle ≤ distinct-key rows) followed by tiny
aggregates — safe to run on the full production input.

No counterpart in guyskk/validr (single-value validation only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "key_skew_report", "suggest_salt",
           "salted_join", "join_fanout_report"]


def heavy_hitters(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Top-k keys by row count: (key, n, share).  TakeOrderedAndProject —
    no global sort.  NULL keys are counted as a key (they are usually the
    hottest one)."""
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("n")))
    total = counts.agg(F.sum("n").alias("t"))
    return (counts.crossJoin(F.broadcast(total))
            .select("key", "n", F.round(F.col("n") / F.col("t"), 6)
                    .alias("share"))
            .orderBy(F.desc("n"), "key").limit(k))


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew summary of a prospective join/groupBy key:

    n_rows, n_keys, max_count, avg_count, skew_factor (max/avg — 1.0 is
    perfectly uniform), null_rows (the classic silent hot key), and
    top1_share (fraction of all rows under the single hottest key —
    the straggler's share of the shuffle).
    """
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("n")))
    return counts.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_count"),
        F.round(F.avg("n"), 6).alias("avg_count"),
        F.round(F.max("n") / F.avg("n"), 6).alias("skew_factor"),
        F.coalesce(F.sum(F.when(F.col("key").isNull(), F.col("n"))),
                   F.lit(0)).alias("null_rows"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top1_share"))


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                salt: int, how: str = "inner",
                salt_source: str | None = None) -> DataFrame:
    """Equi-join that defeats key skew by salting: the SKEWED side gets a
    deterministic salt bucket in ``[0, salt)``, the other side is
    replicated ``salt``× (``explode(sequence(...))`` — a codegen
    generator, the rows are never materialized driver-side), and the join
    runs on ``(key, salt)`` so one hot key spreads over ``salt`` reducers.
    Output columns match ``skewed.join(other, on, how)``.

    The salt is ``pmod(xxhash64(salt_source or ALL skewed-side columns),
    salt)`` — deterministic (resumable runs produce identical plans; no
    ``rand()`` re-evaluation hazard under retries) yet uniform within a
    hot key.  Size ``salt`` with :func:`suggest_salt`.

    Use when AQE's skew-join can't help: AQE only splits SORT-MERGE
    partitions after materializing both sides' shuffle files, and it
    cannot split a skewed AGGREGATION input — explicit salting works for
    both and keeps the hot key off a single reducer from the first
    shuffle onward.  ``how`` supports inner/left joins (semantics
    preserved because every skewed row carries exactly one salt value and
    every other-side key exists in all ``salt`` replicas)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    src = ([F.col(salt_source)] if salt_source
           else [F.col(c) for c in skewed.columns])
    s = skewed.withColumn("_salt", F.pmod(F.xxhash64(*src), F.lit(salt))
                          .cast("int"))
    rep = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return s.join(rep, [on, "_salt"], how).drop("_salt")


def suggest_salt(df: DataFrame, key_col: str,
                 target_rows_per_task: int = 5_000_000) -> int:
    """Salt-bucket count that caps the hottest key at ~target rows per
    task: ceil(max_count / target).  Returns 1 when no salting is needed.
    Driver-side int (reads one aggregated row — not row data)."""
    row = (df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
           .agg(F.max("n").alias("m")).first())
    m = row["m"] or 0
    return max(1, -(-m // target_rows_per_task))


def join_fanout_report(left: DataFrame, right: DataFrame, on: str,
                       k: int = 10) -> DataFrame:
    """Pre-flight estimate of an equi-join's output blow-up: per-key
    count on each side, output rows = n_left · n_right, top-k keys by
    that product plus each key's share of the total join output.

    The 100 TB guard: a join whose top key alone produces 10^10 output
    rows is a job you want to cancel (or :func:`salted_join`, or filter
    the key) BEFORE it runs for six hours.  Cost is two key-sized hash
    aggregates and a distinct-key-sized inner join — safe on full
    production inputs, no corpus-width shuffle.

    NULL keys never match in an equi-join, so they are excluded here
    (they appear in :func:`key_skew_report` as null_rows instead).
    """
    lc = (left.filter(F.col(on).isNotNull())
          .groupBy(F.col(on).alias("key"))
          .agg(F.count(F.lit(1)).alias("n_left")))
    rc = (right.filter(F.col(on).isNotNull())
          .groupBy(F.col(on).alias("key"))
          .agg(F.count(F.lit(1)).alias("n_right")))
    per_key = lc.join(rc, "key").select(
        "key", "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("out_rows"))
    total = per_key.agg(F.sum("out_rows").alias("t"))
    return (per_key.crossJoin(F.broadcast(total))
            .select("key", "n_left", "n_right", "out_rows",
                    F.round(F.col("out_rows") / F.col("t"), 6)
                    .alias("out_share"))
            .orderBy(F.desc("out_rows"), "key").limit(k))
