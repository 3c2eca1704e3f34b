"""Column statistics (null rate, min/max, length distribution).

One full-scan aggregation job: every metric is an algebraic aggregate, so
Spark computes map-side partials and reduces — the shuffle carries one row
per partition, never data rows.  At 10^12 rows this is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as st


def _metrics_for(df: DataFrame, name: str, dtype: st.DataType):
    c = F.col(name)
    is_null = c.isNull()
    if isinstance(dtype, st.StringType):
        is_null = is_null | (c == "")
        measure = F.char_length(c)
    elif isinstance(dtype, st.ArrayType):
        measure = F.size(c)
    elif isinstance(dtype, (st.NumericType,)):
        measure = c.cast("double")
    else:
        measure = F.lit(None).cast("double")
    return [
        F.count(F.lit(1)).alias(f"{name}__count"),
        F.sum(is_null.cast("long")).alias(f"{name}__nulls"),
        F.min(measure).cast("double").alias(f"{name}__min"),
        F.max(measure).cast("double").alias(f"{name}__max"),
        F.avg(measure).alias(f"{name}__avg"),
        F.expr(f"approx_count_distinct({name})").alias(f"{name}__approx_distinct")
        if not isinstance(dtype, st.ArrayType)
        else F.lit(None).cast("long").alias(f"{name}__approx_distinct"),
    ]


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column.

    Columns: (column, n_rows, n_nulls, null_rate, min, max, avg,
    approx_distinct).  min/max/avg are over the value for numerics, the
    char length for strings, the size for arrays.
    """
    types = {f.name: f.dataType for f in df.schema.fields}
    columns = columns or list(types)
    aggs = []
    for name in columns:
        aggs.extend(_metrics_for(df, name, types[name]))
    row = df.agg(*aggs)
    per_col = []
    for name in columns:
        per_col.append(F.struct(
            F.lit(name).alias("column"),
            F.col(f"{name}__count").alias("n_rows"),
            F.col(f"{name}__nulls").alias("n_nulls"),
            (F.col(f"{name}__nulls") / F.col(f"{name}__count"))
            .alias("null_rate"),
            F.col(f"{name}__min").alias("min"),
            F.col(f"{name}__max").alias("max"),
            F.col(f"{name}__avg").alias("avg"),
            F.col(f"{name}__approx_distinct").alias("approx_distinct"),
        ))
    return (row.select(F.explode(F.array(*per_col)).alias("m"))
            .select("m.*"))


def null_rates(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, null_rate) — '' counts as null for strings."""
    return column_profile(df, columns).select(
        "column", "n_rows", "n_nulls", "null_rate")


def length_distribution(df: DataFrame, column: str,
                        probabilities: list[float] | None = None,
                        relative_error: float = 0.001,
                        exact: bool = False) -> DataFrame:
    """Quantiles of a length-like column.

    Default: ``percentile_approx`` sketch (mergeable, one-pass — the only
    sane choice at 10^12 rows).  ``exact=True`` uses the exact
    ``percentile`` aggregate (linear interpolation, matches DuckDB's
    quantile_cont) for small-scale oracle comparison.
    """
    probabilities = probabilities or [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    dtype = dict((f.name, f.dataType) for f in df.schema.fields)[column]
    c = F.col(column)
    if isinstance(dtype, st.StringType):
        c = F.char_length(c)
    elif isinstance(dtype, st.ArrayType):
        c = F.size(c)
    probs = "array(" + ", ".join(map(str, probabilities)) + ")"
    fn = (f"percentile(x, {probs})" if exact
          else f"percentile_approx(x, {probs}, {int(1.0 / relative_error)})")
    return df.select(c.alias("x")).agg(F.expr(fn).alias("quantiles"))


# Φ⁻¹(0.75): scales MAD to a normal-consistent sigma estimate, so
# robust_z is comparable to a classic z-score cutoff (|z| > 3.5 etc.).
MAD_CONSISTENCY = 0.6744897501960817


def robust_center_scale(df: DataFrame, column: str,
                        by: str | None = None, *,
                        exact: bool = False,
                        relative_error: float = 1e-4) -> DataFrame:
    """Per-group median and MAD (median absolute deviation) of ``column``.

    Returns (``by``?, n, median, mad).  MAD is not an algebraic aggregate
    (it needs the median first), so this is necessarily TWO full scans —
    but each one is a map-side-partial aggregate whose shuffle carries
    |groups| rows, and the median table joins back via broadcast: no data
    row ever shuffles.  Default backend is the mergeable
    ``percentile_approx`` sketch (the 10^12-row path); ``exact=True``
    switches to the exact ``percentile`` aggregate (linear interpolation,
    matches DuckDB ``quantile_cont``) for oracle comparison — exact
    percentile buffers each group's values on the reducer, so keep it to
    test scale.
    """
    acc = int(1.0 / relative_error)
    med_fn = ("percentile({0}, 0.5)" if exact
              else f"percentile_approx({{0}}, 0.5, {acc})")
    keys = [by] if by else []
    g1 = df.groupBy(*keys) if keys else df.groupBy()
    med = g1.agg(F.expr(med_fn.format(column)).cast("double").alias("median"),
                 F.count(column).alias("n"))
    joined = (df.join(F.broadcast(med), on=keys) if keys
              else df.crossJoin(F.broadcast(med)))
    dev = F.abs(F.col(column).cast("double") - F.col("median"))
    g2 = (joined.select(*keys, dev.alias("_dev"))
          .groupBy(*keys) if keys
          else joined.select(dev.alias("_dev")).groupBy())
    mad = g2.agg(F.expr(med_fn.format("_dev")).cast("double").alias("mad"))
    out = med.join(F.broadcast(mad), on=keys) if keys else med.crossJoin(mad)
    return out.select(*keys, "n", "median", "mad")


def mad_outliers(df: DataFrame, column: str, by: str | None = None, *,
                 k: float = 3.5, exact: bool = False,
                 relative_error: float = 1e-4) -> DataFrame:
    """Flag robust outliers: |0.6745 · (x − median) / MAD| > ``k``
    (Iglewicz–Hoaglin modified z-score), optionally per ``by`` group.

    Median/MAD resist the very contamination being hunted (a classic
    mean/stddev z-score is dragged by the outliers themselves).  Input
    columns pass through plus ``robust_z`` and ``is_outlier``; rows with
    NULL value — or in a group with MAD = 0 (> half the group identical;
    any deviation divides by zero) — get NULL robust_z / false.  Cost:
    the two stats scans of `robust_center_scale` + one broadcast join;
    data rows never shuffle.
    """
    stats = robust_center_scale(df, column, by, exact=exact,
                                relative_error=relative_error)
    keys = [by] if by else []
    joined = (df.join(F.broadcast(stats), on=keys) if keys
              else df.crossJoin(F.broadcast(stats)))
    z = F.when(
        F.col(column).isNotNull() & (F.col("mad") > 0),
        F.lit(MAD_CONSISTENCY) * (F.col(column).cast("double")
                                  - F.col("median")) / F.col("mad"))
    return (joined
            .withColumn("robust_z", z)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(F.col("robust_z")) > k,
                                   F.lit(False)))
            .drop("n", "median", "mad"))


def robust_clip(df: DataFrame, column: str, by: str | None = None, *,
                k: float = 3.5, exact: bool = False,
                relative_error: float = 1e-4,
                out_col: str | None = None) -> DataFrame:
    """Winsorize: clip ``column`` into the interval where `mad_outliers`
    would NOT flag it — median ± k·MAD/0.6745 per group.  The repair twin
    of the flagging operator: same two stats scans + broadcast join, then
    a pure map-side least/greatest.  Groups with MAD = 0 pass through
    unclipped (no scale estimate to clip against)."""
    stats = robust_center_scale(df, column, by, exact=exact,
                                relative_error=relative_error)
    keys = [by] if by else []
    joined = (df.join(F.broadcast(stats), on=keys) if keys
              else df.crossJoin(F.broadcast(stats)))
    half = F.lit(k) * F.col("mad") / F.lit(MAD_CONSISTENCY)
    lo, hi = F.col("median") - half, F.col("median") + half
    c = F.col(column)
    clipped = F.when(c.isNull() | (F.col("mad") <= 0), c) \
        .otherwise(F.least(F.greatest(c.cast("double"), lo), hi))
    return (joined.withColumn(out_col or column, clipped)
            .drop("n", "median", "mad"))


def numeric_correlations(df: DataFrame, cols: list[str],
                         round_to: int | None = None) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over ``cols``
    in ONE aggregation pass (Deequ's Correlation analyzer shape).

    Output: one row per unordered pair — (col_a, col_b, corr, covar),
    pair order following ``cols``.  Rows where either side is NULL are
    excluded pairwise (Spark/SQL ``corr`` semantics).  ``round_to``
    rounds both metrics (oracle mode; float reduction order differs
    between engines in the last ulps).

    corr is computed as ``try_divide(covar_samp, sd_a * sd_b)`` rather
    than the builtin ``corr`` aggregate: under ANSI mode (Spark 4
    default) ``corr`` raises DIVIDE_BY_ZERO when either column is
    constant — one constant column in a 10^12-row profile job would
    kill the whole pass.  This form returns NULL for that pair instead
    (SQL-standard corr-of-constant), identically to DuckDB.

    Scale: all |cols|·(|cols|−1)/2 pairs are algebraic aggregates in a
    single ``agg`` — map-side partials, the shuffle carries one partial
    row per partition, never data rows.  At 10^12 rows this is
    scan-bound regardless of pair count; the long-format pivot is a
    driver-free ``stack`` over the single result row.
    """
    if len(cols) < 2:
        raise ValueError("numeric_correlations needs >= 2 columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for a, b in pairs:
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        # pairwise-complete stddevs: mask each side on the OTHER side's
        # nulls so the denominator matches corr's pairwise exclusion
        ma = F.when(cb.isNotNull(), ca)
        mb = F.when(ca.isNotNull(), cb)
        cov = F.covar_samp(ca, cb)
        corr = F.try_divide(cov, F.stddev_samp(ma) * F.stddev_samp(mb))
        if round_to is not None:
            corr, cov = F.round(corr, round_to), F.round(cov, round_to)
        aggs.append(corr.alias(f"__corr_{a}__{b}"))
        aggs.append(cov.alias(f"__cov_{a}__{b}"))
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{a}', '{b}', `__corr_{a}__{b}`, `__cov_{a}__{b}`"
        for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stacked}) as (col_a, col_b, corr, covar)")


def top_k_per_group(df: DataFrame, group_cols: list[str] | str,
                    order_cols: list, k: int,
                    rank_col: str | None = None) -> DataFrame:
    """Generic deterministic top-k rows per group — the building block
    behind violation triage, per-domain caps, and k-NN trimming, exposed
    directly.

    ``order_cols`` are Columns or names (wrap with ``F.desc(...)`` for
    descending); make the ordering TOTAL (include a unique id as the
    last key) or ties at the boundary are planner-dependent.  With
    ``rank_col`` set, the 1-based rank is kept in the output.

    Scale shape: ONE window shuffle on the group key; the planner's
    WindowGroupLimit pushes a partial top-k into every map task, so the
    shuffle carries at most k rows per (task, group) — a hot group costs
    k x tasks rows, never its full population.
    """
    from pyspark.sql import Window
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    ranked = df.withColumn("_rk", F.row_number().over(w))
    out = ranked.filter(F.col("_rk") <= k)
    if rank_col:
        return out.withColumnRenamed("_rk", rank_col)
    return out.drop("_rk")


def table_fingerprint(df: DataFrame,
                      cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive content fingerprint of a table: one row with
    ``n_rows`` and ``fingerprint`` — equal iff the multiset of row
    renderings is equal (any added/removed/changed row flips it; row
    order and partitioning never do).

    The lineage/provenance primitive: record it in the run manifest and
    a re-run (or a migrated copy on another engine) is verified
    changed/unchanged in one scan, without a row-level diff
    (operators/diff.py is the tool when it DID change).

    Per-row hash = first 15 hex chars of md5 over a LENGTH-PREFIXED
    rendering of ``cols`` (`len:value` per cell, `N` for NULL — length
    prefixes make cell boundaries unambiguous, so a value containing
    the separator can never alias another row, and NULL can never alias
    any string).  md5, not xxhash64, so any engine can recompute it —
    the DuckDB twin is asserted in the oracle.  Hashes combine with the
    ``bit_xor`` aggregate: commutative/associative, overflow-free under
    ANSI, map-side partial-aggregated — the shuffle carries one long
    per partition.  XOR cancels PAIRS of identical rows, so two tables
    differing by an even count of the same duplicated row collide on
    ``fingerprint`` alone; ``n_rows`` is part of this output for
    exactly that reason, and exact duplicate analysis is
    ``exact_duplicates``'s job.
    """
    cols = cols or df.columns
    parts = []
    for c in cols:
        cs = F.col(c).cast("string")
        parts.append(F.when(cs.isNull(), F.lit("N"))
                     .otherwise(F.concat(F.length(cs).cast("string"),
                                         F.lit(":"), cs)))
    rendered = F.concat(*parts)
    h = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("long")
    return df.select(h.alias("_h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("fingerprint"))
