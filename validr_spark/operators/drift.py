"""Distribution-drift checks: Kolmogorov–Smirnov and chi-square.

Two KS variants:

* ``ks_exact`` — windowed ECDF over the union of both samples.  Exact, but
  the unpartitioned window collapses to one reducer: use for tests/oracles
  and small slices only.
* ``ks_approx`` — evaluates both ECDFs on a fixed quantile grid taken from
  the reference sample (mergeable ``percentile_approx`` sketch + one
  aggregate per side).  max|ΔECDF| error is bounded by the grid resolution;
  the whole job is two scan-aggregates, no row-level shuffle — this is the
  10^12-row path.

Chi-square compares two count histograms (already aggregated → tiny inputs)
via a full outer join on the category key.  The explode+groupBy that
produces a token histogram is the heavy part; it partial-aggregates
map-side, so the shuffle carries ≤ vocab-size rows per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ks_exact(df_a: DataFrame, df_b: DataFrame, col: str,
             max_rows: int = 10_000_000) -> DataFrame:
    """Exact two-sample KS statistic (single-row DF: ``ks``).

    Window over global order — one reducer; test/oracle use only.  The
    ``max_rows`` guard (a cheap columnar count) ENFORCES that: above it the
    single-reducer sort would be the scale-killer, so callers are pointed
    at :func:`ks_approx` instead of silently running it.  Pass
    ``max_rows=None`` to opt out.
    """
    if max_rows is not None:
        n = df_a.select(col).count() + df_b.select(col).count()
        if n > max_rows:
            raise ValueError(
                f"ks_exact over {n} rows exceeds max_rows={max_rows}: the "
                "unpartitioned window is single-reducer. Use ks_approx "
                "(grid-based, two scan-aggregates) at scale, or pass "
                "max_rows=None to force.")
    # NULLs carry no distribution mass: without this filter they inflate
    # na/nb and form a NULL-x cumulative group, so two identical non-null
    # distributions with different null rates report spurious drift
    # (ks_approx already ignores NULLs — percentile/avg skip them).
    a = (df_a.select(F.col(col).cast("double").alias("x"),
                     F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
         .filter(F.col("x").isNotNull()))
    b = (df_b.select(F.col(col).cast("double").alias("x"),
                     F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
         .filter(F.col("x").isNotNull()))
    u = a.unionAll(b)
    from pyspark.sql import Window

    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    totals = u.agg(F.sum("in_a").alias("na"), F.sum("in_b").alias("nb"))
    cum = (u.withColumn("ca", F.sum("in_a").over(w))
           .withColumn("cb", F.sum("in_b").over(w))
           .groupBy("x").agg(F.max("ca").alias("ca"), F.max("cb").alias("cb")))
    return (cum.crossJoin(totals)
            .agg(F.max(F.abs(F.col("ca") / F.col("na")
                             - F.col("cb") / F.col("nb"))).alias("ks")))


def ks_approx(df_a: DataFrame, df_b: DataFrame, col: str,
              grid_size: int = 256, relative_error: float = 1e-4) -> DataFrame:
    """Grid-based KS (single-row DF: ``ks``). Scales: 2 aggregate passes."""
    probs = [i / grid_size for i in range(1, grid_size)]
    grid = df_a.select(F.col(col).cast("double").alias("x")).agg(
        F.percentile_approx("x", probs, int(1 / relative_error)).alias("g"))

    # evaluate ECDF of each side on the same grid in ONE aggregate:
    # avg over rows of (x <= g[i]) per grid index, as an array aggregate.
    def ecdf_arr(df):
        return (df.select(F.col(col).cast("double").alias("x"))
                .crossJoin(F.broadcast(grid))
                .agg(*[F.avg((F.col("x") <= F.get(F.col("g"), i))
                             .cast("double")).alias(f"e{i}")
                       for i in range(grid_size - 1)]))

    ea = ecdf_arr(df_a)
    eb = ecdf_arr(df_b)
    diffs = [F.abs(ea[f"e{i}"] - eb[f"e{i}"]) for i in range(grid_size - 1)]
    return ea.crossJoin(eb).select(F.greatest(*diffs).alias("ks"))


def category_counts(df: DataFrame, col: str) -> DataFrame:
    return df.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("n"))


def token_histogram(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Token-id histogram via explode + hash agg (map-side partials cap the
    shuffle at vocab-size rows per map task)."""
    return (df.select(F.explode(tokens_col).alias("category"))
            .groupBy("category").agg(F.count(F.lit(1)).alias("n")))


def chi_square_counts(obs: DataFrame, exp: DataFrame) -> DataFrame:
    """χ² = Σ (obs − exp·scale)² / (exp·scale) over two count tables
    (category, n).  Inputs are post-aggregation — tiny; broadcast join.
    Returns single row (chi2, dof)."""
    o = obs.select(F.col("category"), F.col("n").alias("n_obs"))
    e = exp.select(F.col("category"), F.col("n").alias("n_exp"))
    joined = o.join(F.broadcast(e), "category", "full_outer").fillna(
        0, subset=["n_obs", "n_exp"])
    totals = joined.agg((F.sum("n_obs") / F.sum("n_exp")).alias("scale"))
    scale = F.col("scale")
    return joined.crossJoin(F.broadcast(totals)).filter(F.col("n_exp") > 0).agg(
        F.sum(F.pow(F.col("n_obs") - F.col("n_exp") * scale, 2)
              / (F.col("n_exp") * scale)).alias("chi2"),
        (F.count(F.lit(1)) - 1).alias("dof"),
    )


def value_entropy(df: DataFrame, col: str,
                  by: list[str] | None = None) -> DataFrame:
    """Shannon entropy (bits) of a column's value distribution, optionally
    per group: ``(*by, n, n_distinct, entropy)``.

    Complements KS/chi²/PSI with a scalar diversity signal — token-id
    usage entropy per source (has a source collapsed to few tokens?),
    category-mix entropy per day, vocabulary coverage of a corpus slice.
    For token arrays explode first:
    ``value_entropy(df.select("source", F.explode("tokens").alias("tok")),
    "tok", by=["source"])``.

    ``entropy = log2(n) − Σ c·log2(c) / n`` over per-value counts — two
    chained hash-aggs, map-side partials, shuffle ≤ distinct values per
    group; never a driver-side histogram.  NULLs are ignored (they are a
    null-rate concern, not a distribution one).
    """
    keys = list(by or [])
    per_val = (df.filter(F.col(col).isNotNull())
               .groupBy(*keys, col)
               .agg(F.count(F.lit(1)).alias("_c")))
    cnt = F.col("_c").cast("double")
    n = F.sum("_c").cast("double")
    return (per_val.groupBy(*keys)
            .agg(F.sum("_c").alias("n"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.round(F.log2(n) - F.sum(cnt * F.log2(cnt)) / n, 6)
                 .alias("entropy")))


def psi(df_ref: DataFrame, df_new: DataFrame, col: str,
        bins: int = 10, eps: float = 1e-6) -> DataFrame:
    """Population Stability Index over equal-width bins of the REFERENCE
    range (single-row DF: ``psi``, ``n_bins``).

    PSI = Σ (p_i − q_i)·ln(p_i / q_i), p = reference share, q = new share;
    both shares floored at ``eps`` so empty bins contribute finitely (the
    standard industry convention — PSI < 0.1 stable, > 0.25 shifted).

    Bin edges come from the reference min/max only (one tiny aggregate),
    so the binning is a pure per-row expression on both sides — two scan
    aggregates total, shuffle carries ≤ ``bins`` rows.  Values in the new
    sample outside the reference range clamp into the edge bins (that IS
    the drift signal, not an error).
    """
    rng = df_ref.agg(F.min(F.col(col).cast("double")).alias("lo"),
                     F.max(F.col(col).cast("double")).alias("hi"))

    def binned(df):
        x = F.col(col).cast("double")
        w = (F.col("hi") - F.col("lo")) / bins
        raw = F.floor((x - F.col("lo")) / w).cast("int")
        b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
        safe = F.when(F.col("hi") > F.col("lo"), b).otherwise(F.lit(0))
        return (df.filter(x.isNotNull()).crossJoin(F.broadcast(rng))
                .groupBy(safe.alias("bin"))
                .agg(F.count(F.lit(1)).alias("n")))

    r = binned(df_ref).withColumnRenamed("n", "n_ref")
    n = binned(df_new).withColumnRenamed("n", "n_new")
    j = (r.join(n, "bin", "full_outer")
         .fillna(0, subset=["n_ref", "n_new"]))
    tot = j.agg(F.sum("n_ref").alias("tr"), F.sum("n_new").alias("tn"))
    # try_divide + NULL-out: an empty side (total 0) must yield psi NULL,
    # not a DIVIDE_BY_ZERO that kills the job under ANSI (default-on)
    p = F.greatest(F.try_divide("n_ref", "tr"), F.lit(eps))
    q = F.greatest(F.try_divide("n_new", "tn"), F.lit(eps))
    return (j.crossJoin(F.broadcast(tot))
            .agg(F.when((F.min("tr") > 0) & (F.min("tn") > 0),
                        F.sum((p - q) * F.log(p / q))).alias("psi"),
                 F.count(F.lit(1)).alias("n_bins")))


def jsd(df_ref: DataFrame, df_new: DataFrame, col: str) -> DataFrame:
    """Jensen–Shannon divergence between two categorical distributions
    (log2 — bounded [0, 1]; symmetric, defined even where KL blows up).

    Completes the drift family's categorical corner: chi² is count-scale
    sensitive, PSI needs eps floors on empty bins; JSD handles disjoint
    supports natively (a category absent from one side contributes its
    full share·log2(2) through the mixture, never a division by zero).

    Scale shape: one hash-agg per side (shuffle ≤ distinct categories),
    full-outer join of two category-sized tables, one-row summary.
    Returns (jsd, n_categories, n_ref, n_new).
    """
    a = df_ref.groupBy(F.col(col).alias("cat")).agg(
        F.count(F.lit(1)).alias("na"))
    b = df_new.groupBy(F.col(col).alias("cat")).agg(
        F.count(F.lit(1)).alias("nb"))
    j = (a.join(b, "cat", "full_outer")
         .select(F.coalesce("na", F.lit(0)).alias("na"),
                 F.coalesce("nb", F.lit(0)).alias("nb")))
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"),
                F.count(F.lit(1)).alias("n_categories"))
    w = j.crossJoin(F.broadcast(tot))
    p = F.col("na") / F.col("ta")
    q = F.col("nb") / F.col("tb")
    m = (p + q) / 2
    term = (F.when(p > 0, p * F.log2(p / m)).otherwise(F.lit(0.0)) +
            F.when(q > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))) / 2
    # RAW jsd, not pre-rounded: drift_gate compares this value to its
    # bound, and an operator-side round would re-open the rounded-gate
    # hole checks.drift_gate closed.  Reports round at the projection
    # (drift_report round_digits / the oracle queries).
    return (w.select(term.alias("t"), "n_categories", "ta", "tb")
            .groupBy("n_categories", "ta", "tb")
            .agg(F.sum("t").alias("jsd"))
            .select(F.col("jsd"), "n_categories",
                    F.col("ta").alias("n_ref"), F.col("tb").alias("n_new")))


def wasserstein1(df_a: DataFrame, df_b: DataFrame, col: str,
                 grid: int = 100, exact: bool = False,
                 relative_error: float = 0.001) -> DataFrame:
    """Wasserstein-1 (earth mover's) distance between two numeric
    columns, single-row DF ``(w1, n_a, n_b)``.

    W1 = ∫₀¹ |Q_a(u) − Q_b(u)| du, approximated as the mean of
    |Q_a − Q_b| over a ``grid``-point midpoint rule (u = (i+0.5)/grid).
    Complements the drift family: KS sees the worst POINT of CDF
    separation, W1 sees the AREA between the CDFs — a small uniform shift
    of a wide distribution moves W1 by exactly that shift while barely
    registering on KS.

    Scale shape: one quantile aggregate per side — the default
    ``percentile_approx`` sketch is mergeable/one-pass (the 10^12-row
    path); ``exact=True`` uses the exact ``percentile`` aggregate
    (linear interpolation, matches DuckDB ``quantile_cont``) for oracle
    comparison.  The grid arrays meet in a 1×1 cross join; everything
    after the two aggregates is O(grid).
    """
    probs = [(i + 0.5) / grid for i in range(grid)]
    plist = ", ".join(repr(p) for p in probs)
    fn = (f"percentile(x, array({plist}))" if exact
          else f"percentile_approx(x, array({plist}), "
               f"{int(1.0 / relative_error)})")

    def quant(df, qname, nname):
        return (df.select(F.col(col).cast("double").alias("x"))
                .filter(F.col("x").isNotNull())
                .selectExpr(f"{fn} AS {qname}",
                            f"count(x) AS {nname}"))

    j = (quant(df_a, "qa", "n_a")
         .crossJoin(quant(df_b, "qb", "n_b")))
    # explode_outer: an empty side makes its quantile array (hence the
    # zip) NULL — the outer explode keeps one row so the COUNTS still
    # come through (w1 itself is NULL, which is the honest answer)
    ex = j.select("n_a", "n_b",
                  F.explode_outer(F.arrays_zip("qa", "qb")).alias("z"))
    # RAW w1 (same contract as jsd above): gating consumers need the
    # unrounded metric; reporting consumers round at the projection.
    return ex.agg(
        F.avg(F.abs(F.col("z.qa") - F.col("z.qb"))).alias("w1"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"))


def psi_quantile(df_ref: DataFrame, df_new: DataFrame, col: str,
                 bins: int = 10, eps: float = 1e-6,
                 exact: bool = False,
                 relative_error: float = 0.001) -> DataFrame:
    """PSI over EQUAL-FREQUENCY bins of the reference distribution
    (single-row DF: ``psi``, ``n_bins``) — the production-monitoring
    convention (each reference bin holds ~1/bins of the mass, so every
    term is well-populated; equal-width :func:`psi` can concentrate 99%
    of a heavy-tailed column into one bin and go numb).

    Bin edges are the reference's interior quantiles — ONE aggregate:
    the default ``percentile_approx`` sketch is mergeable (the 10^12-row
    path); ``exact=True`` uses exact ``percentile`` (== DuckDB
    ``quantile_cont``) for oracle comparison.  Bin assignment is an
    unrolled codegen comparison sum against the broadcast edge array (no
    lambda HOFs, no per-row Python); both sides then hash-agg to ≤bins
    rows.  Ties/repeated edges degrade gracefully: duplicate edges make
    some bins empty, the eps floor keeps their terms finite.
    """
    probs = [i / bins for i in range(1, bins)]
    plist = ", ".join(repr(p) for p in probs)
    fn = (f"percentile(x, array({plist}))" if exact
          else f"percentile_approx(x, array({plist}), "
               f"{int(1.0 / relative_error)})")
    edges = (df_ref.select(F.col(col).cast("double").alias("x"))
             .filter(F.col("x").isNotNull())
             .selectExpr(f"{fn} AS edges"))

    def binned(df):
        x = F.col(col).cast("double")
        b = sum((x >= F.get(F.col("edges"), i)).cast("int")
                for i in range(bins - 1))
        return (df.filter(x.isNotNull()).crossJoin(F.broadcast(edges))
                .groupBy(b.alias("bin"))
                .agg(F.count(F.lit(1)).alias("n")))

    r = binned(df_ref).withColumnRenamed("n", "n_ref")
    n = binned(df_new).withColumnRenamed("n", "n_new")
    j = (r.join(n, "bin", "full_outer")
         .fillna(0, subset=["n_ref", "n_new"]))
    tot = j.agg(F.sum("n_ref").alias("tr"), F.sum("n_new").alias("tn"))
    # try_divide + NULL-out: an empty side (total 0) must yield psi NULL,
    # not a DIVIDE_BY_ZERO that kills the job under ANSI (default-on)
    p = F.greatest(F.try_divide("n_ref", "tr"), F.lit(eps))
    q = F.greatest(F.try_divide("n_new", "tn"), F.lit(eps))
    return (j.crossJoin(F.broadcast(tot))
            .agg(F.when((F.min("tr") > 0) & (F.min("tn") > 0),
                        F.sum((p - q) * F.log(p / q))).alias("psi"),
                 F.count(F.lit(1)).alias("n_bins")))


def drift_report(df_ref: DataFrame, df_new: DataFrame,
                 numeric_cols: list[str] | None = None,
                 cat_cols: list[str] | None = None,
                 bins: int = 10,
                 round_digits: int | None = 6) -> DataFrame:
    """One-stop per-column drift scorecard between two table versions:
    one row per column with every applicable metric —

    - numeric: ``ks`` (grid-approx), ``w1``, ``psi`` (equal-frequency
      sketch bins), n_ref/n_new;
    - categorical: ``jsd``, ``psi`` is NULL, ``n_categories``.

    Composition of the single-metric operators (each independently
    oracle-checked); the per-column summaries are one-row DataFrames
    unioned driver-side, so cost is O(columns) small aggregates — run it
    on a sampled or filtered slice when the column list is wide.  Spark
    evaluates the per-column jobs lazily within one action when the
    caller collects the unioned result.

    ``round_digits`` shapes the REPORTED metric columns; pass ``None``
    for raw doubles — anything that GATES on these values (drift_gate)
    must consume the raw form, since a pre-rounded metric can sit up to
    half an ulp-of-the-last-digit past a bound and still look equal.
    """
    from functools import reduce as _reduce

    def _r(c):
        return F.round(c, round_digits) if round_digits is not None else c

    parts: list[DataFrame] = []
    for c in numeric_cols or []:
        ks = ks_approx(df_ref, df_new, c).select(
            F.col("ks").cast("double").alias("ks"))
        w = wasserstein1(df_ref, df_new, c).select(
            F.col("w1").cast("double").alias("w1"),
            F.col("n_a").alias("n_ref"), F.col("n_b").alias("n_new"))
        ps = psi_quantile(df_ref, df_new, c, bins=bins).select(
            F.col("psi").cast("double").alias("psi"))
        parts.append(
            ks.crossJoin(w).crossJoin(ps).select(
                F.lit(c).alias("column"), F.lit("numeric").alias("kind"),
                _r(F.col("ks")).alias("ks"), _r(F.col("w1")).alias("w1"),
                _r(F.col("psi")).alias("psi"),
                F.lit(None).cast("double").alias("jsd"),
                "n_ref", "n_new"))
    for c in cat_cols or []:
        j = jsd(df_ref, df_new, c)
        parts.append(j.select(
            F.lit(c).alias("column"), F.lit("categorical").alias("kind"),
            F.lit(None).cast("double").alias("ks"),
            F.lit(None).cast("double").alias("w1"),
            F.lit(None).cast("double").alias("psi"),
            _r(F.col("jsd").cast("double")).alias("jsd"),
            F.col("n_ref"), F.col("n_new")))
    if not parts:
        raise ValueError("drift_report: pass numeric_cols and/or cat_cols")
    return _reduce(DataFrame.unionByName, parts).orderBy("column")


def psi_by_group(df_ref: DataFrame, df_new: DataFrame, col: str,
                 by: str, bins: int = 10, eps: float = 1e-6) -> DataFrame:
    """PSI per group in ONE pass per side — the fleet-monitoring shape:
    one row per ``by`` value with its PSI over equal-width bins of that
    group's REFERENCE range.

    Calling :func:`psi` in a loop over 10,000 sources costs 20,000 scan
    jobs; this computes identical per-group statistics with two
    aggregates (group-range, then (group, bin) counts on both sides
    joined full-outer) — shuffles carry |groups| and |groups|·bins rows.
    Groups present on only one side get NULL psi (no reference = no
    statement, not zero drift): ref-only groups report their counts with
    n_new_rows=0, and new-only groups — the loudest drift signal, a
    brand-new source the reference has never seen — are unioned back in
    with psi NULL and n_ref_rows=0 rather than silently dropped by the
    range join (round-3 fix of an ADVICE.md finding).

    The group key is struct-wrapped so every join on it is null-safe
    (Spark compares struct fields with null-equals-null ordering): a
    NULL ``by`` value is a real group — without the wrap the USING
    joins would drop it from ``main`` and the anti-join would misreport
    it as brand-new even when the reference contains NULL-group rows.
    """
    g = F.struct(F.col(by).alias("g")).alias("grp")
    rng = (df_ref.filter(F.col(col).isNotNull()).groupBy(g)
           .agg(F.min(F.col(col).cast("double")).alias("lo"),
                F.max(F.col(col).cast("double")).alias("hi")))

    def binned(df, nname):
        src = F.col(col).cast("double")
        x = F.col("x")
        w = (F.col("hi") - F.col("lo")) / bins
        raw = F.floor((x - F.col("lo")) / w).cast("int")
        b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
        safe = F.when(F.col("hi") > F.col("lo"), b).otherwise(F.lit(0))
        return (df.filter(src.isNotNull()).select(g, src.alias("x"))
                .join(rng, "grp")           # inner: drops no-ref groups
                .groupBy("grp", safe.alias("bin"))
                .agg(F.count(F.lit(1)).alias(nname)))

    r = binned(df_ref, "n_ref")
    n = binned(df_new, "n_new")
    j = (r.join(n, ["grp", "bin"], "full_outer")
         .fillna(0, subset=["n_ref", "n_new"]))
    tot = j.groupBy("grp").agg(F.sum("n_ref").alias("tr"),
                               F.sum("n_new").alias("tn"))
    # try_divide: a ref-only group has tn = 0 — its psi is NULLed below,
    # but under ANSI a plain 0/0 would kill the whole job first
    p = F.greatest(F.try_divide("n_ref", "tr"), F.lit(eps))
    q = F.greatest(F.try_divide("n_new", "tn"), F.lit(eps))
    main = (j.join(tot, "grp")
            .groupBy("grp")
            .agg(F.when(F.first("tn") > 0,
                        F.round(F.sum((p - q) * F.log(p / q)), 6))
                 .alias("psi"),
                 F.first("tr").alias("n_ref_rows"),
                 F.first("tn").alias("n_new_rows"))
            .select(F.col("grp.g").alias(by), "psi",
                    "n_ref_rows", "n_new_rows"))
    # Groups that exist ONLY in df_new never reach the range join (it is
    # inner on the REFERENCE range table) — union them back with psi
    # NULL / n_ref_rows 0 so a brand-new source is visible, not hidden.
    # left_anti against the (already computed, |groups|-sized) range
    # table; the extra shuffle carries |new-only groups| rows.
    new_only = (df_new.filter(F.col(col).isNotNull()).select(g)
                .groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n_new_rows"))
                .join(rng.select("grp"), "grp", "left_anti")
                .select(F.col("grp.g").alias(by),
                        F.lit(None).cast("double").alias("psi"),
                        F.lit(0).cast("bigint").alias("n_ref_rows"),
                        F.col("n_new_rows")))
    return main.unionByName(new_only).orderBy(by)
