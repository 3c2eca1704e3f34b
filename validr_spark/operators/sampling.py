"""Deterministic sampling, splitting and source mixing for training-data
pipelines.

Every operator here is *hash-deterministic*: membership depends only on a
key column and a seed, never on partitioning, task scheduling or RNG state.
That property is what makes sampling usable at 100 TB:

* **Reproducible** — the same (key, seed) keeps/drops the same row on any
  cluster size, so a resumed or re-run job produces the identical sample
  (`df.sample()` does not: it is partition-RNG based and changes whenever
  the scan splits change).
* **Map-side only** — `hash_sample`, `split_assign` and `weighted_mix` are
  pure filters/projections on the scan: no shuffle, no driver state; they
  compose with predicate pushdown and AQE untouched.
* **Oracle-friendly** — the uniform variate is the first 8 hex chars of
  ``md5(seed|key)`` compared against a *hex-string threshold*.  MD5 is
  bit-identical everywhere (Spark, DuckDB, Python), lowercase-hex string
  order equals numeric order, so an external SQL engine reproduces the
  exact sample for auditing.

Only ``stratified_sample`` shuffles (by design: exact per-stratum k needs
co-location of each stratum once); for heavily-skewed strata pass
``prefilter`` to cut the sorted set to ~k·oversample rows map-side first.

No counterpart in the reference (guyskk/validr is single-row validation);
this is the distributed-pipeline layer the brief's §training-data ops asks
for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_prefix", "fraction_threshold", "hash_sample", "split_assign",
    "weighted_mix", "stratified_sample", "sample_report",
    "temperature_weights", "write_training_shards",
    "upsample_epochs",
]

_PREFIX_LEN = 8          # 8 hex chars = 32 bits of the md5 digest
_SPACE = 16 ** _PREFIX_LEN


def hash_prefix(key: Column | str, seed: str = "42") -> Column:
    """Deterministic uniform variate for a row: the first 8 lowercase-hex
    chars of ``md5(seed|key)``.  Compared as a *string* against
    :func:`fraction_threshold` — identical semantics in any engine with a
    standard md5, no numeric conversion needed."""
    key = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), key.cast("string"))),
        1, _PREFIX_LEN)


def fraction_threshold(fraction: float) -> str:
    """Hex-string threshold t such that P[hash_prefix < t] == fraction
    (to 1/2^32).  Clamped to [0, 1]."""
    fraction = min(max(fraction, 0.0), 1.0)
    if fraction >= 1.0:
        # 'g' > any hex char: keep-all sentinel ('f'*8 would drop a key
        # hashing to exactly 0xffffffff)
        return "g" * _PREFIX_LEN
    return format(int(fraction * _SPACE), "0%dx" % _PREFIX_LEN)


def hash_sample(df: DataFrame, fraction: float, key: str,
                seed: str = "42") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows keyed by ``key``.

    Pure map-side filter (one md5 per row, whole-stage codegen); survives
    resume/re-run/cluster-resize bit-identically.  Equal keys always land
    on the same side — dedupe first if key collisions would bias the rate.
    """
    return df.filter(hash_prefix(key, seed) < F.lit(fraction_threshold(fraction)))


def split_assign(df: DataFrame, weights: dict[str, float], key: str,
                 seed: str = "42", split_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split (train/val/test, ...).

    ``weights`` maps split name → weight (normalized internally; dict
    order fixes the interval layout).  Deterministic in (key, seed): a
    document can never migrate between train and test across runs — the
    leakage guarantee a training pipeline needs.  Map-side only.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {name: weight} dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    h = hash_prefix(key, seed)
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h < F.lit(fraction_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def weighted_mix(df: DataFrame, rates: dict[str, float], source_col: str,
                 key: str, seed: str = "42",
                 default_rate: float = 0.0) -> DataFrame:
    """Per-source sampling rates in one pass — the "data mixing" step of a
    pretraining pipeline (e.g. keep 100% of wiki, 30% of web crawl).

    ``rates`` maps source value → keep fraction; unlisted sources keep
    ``default_rate``.  One md5 + a CASE over thresholds per row: map-side,
    no shuffle, deterministic.  For rates > 1 (upsampling) use
    :func:`split_assign`-style epochs upstream instead — an engine-side
    row multiplier would break the dedup/uniqueness invariants downstream.
    """
    for s, r in rates.items():
        if r < 0 or r > 1:
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    h = hash_prefix(key, seed)
    src = F.col(source_col)
    thr = None
    for s, r in rates.items():
        cond = src == F.lit(s)
        t = F.lit(fraction_threshold(r))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    dflt = F.lit(fraction_threshold(default_rate))
    thr = dflt if thr is None else thr.otherwise(dflt)
    return df.filter(h < thr)


def stratified_sample(df: DataFrame, strata: list[str] | str, k: int,
                      key: str, seed: str = "42",
                      prefilter: float | None = None) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by hash
    order — a deterministic "uniform without replacement" per group.

    The one shuffle here is irreducible (exact per-group k requires
    co-locating each stratum once), but the sort is per-stratum, not
    global.  For skewed strata at scale pass ``prefilter`` (e.g.
    ``50 * k / expected_min_stratum_size``): a map-side
    :func:`hash_sample` cuts each stratum to ~prefilter·n rows *before*
    the shuffle, preserving the exact same top-k as long as k survivors
    remain (hash order is stable under subsetting — the kept set is a
    prefix-closed filter of the same ordering).
    """
    strata = [strata] if isinstance(strata, str) else list(strata)
    h = hash_prefix(key, seed)
    base = df
    if prefilter is not None:
        base = hash_sample(df, prefilter, key, seed)
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(key).asc())
    return (base.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def sample_report(df: DataFrame, sampled: DataFrame,
                  group_col: str) -> DataFrame:
    """Audit table: per-group input rows, kept rows, realized rate."""
    a = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_in"))
    b = sampled.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_kept"))
    return (a.join(b, group_col, "left")
            .withColumn("n_kept", F.coalesce("n_kept", F.lit(0)))
            .withColumn("rate", F.round(F.col("n_kept") / F.col("n_in"), 6)))


def training_order(df: DataFrame, key: str, seed: str = "42",
                   shards: int = 256) -> DataFrame:
    """Deterministic global shuffle for training output: assign every row
    a ``(shard, pos)`` reading order derived from ``md5(seed|key)`` —
    document-level shuffling a pretraining data loader consumes shard by
    shard.  Unlike ``ORDER BY rand()`` (a global sort on a
    nondeterministic key) or ``repartition`` (sampled, run-varying range
    boundaries), this order is a pure function of (seed, key): reruns,
    resumed runs, and independent engines produce the identical order.

    ``shard`` = the hash's first 8 hex chars mod ``shards`` (uniform);
    ``pos`` = dense rank within the shard by (full hash, key).  One
    per-shard window — the sort is per-shard, never global.  Write with
    ``.repartition(shards, "shard").sortWithinPartitions("shard",
    "pos")`` partitioned by shard, and read shards in index order.
    """
    if shards <= 0:
        raise ValueError("training_order: shards must be positive")
    full = F.md5(F.concat_ws("|", F.lit(seed), F.col(key).cast("string")))
    shard = F.pmod(F.conv(F.substring(full, 1, 8), 16, 10).cast("long"),
                   F.lit(shards)).cast("int")
    out = df.withColumn("shard", shard).withColumn("_fh", full)
    w = Window.partitionBy("shard").orderBy(F.col("_fh"),
                                            F.col(key).cast("string"))
    return (out.withColumn("pos", F.row_number().over(w))
            .drop("_fh"))


def temperature_weights(df: DataFrame, by: str = "source",
                        weight_col: str | None = None,
                        alpha: float = 0.3,
                        total_budget: float | None = None) -> DataFrame:
    """Temperature-smoothed mixture weights per ``by`` group — the
    multilingual/multi-source rebalancing rule (XLM-R, mT5):
    ``q_i = p_i^alpha / Σ p_j^alpha`` over observed shares ``p_i``
    (by rows, or by ``weight_col`` sums — tokens, chars).

    ``alpha = 1`` keeps the natural distribution; ``alpha → 0``
    approaches uniform — low-resource groups get upsampled relative to
    their share without the head group drowning the mix.  With
    ``total_budget`` set, a ``budget`` column prescribes each group's cut
    (``q_i · total_budget``, floored to long) — feed it straight into
    ``take_token_budgets`` / ``take_grouped_budgets`` (operators/packing)
    for the deterministic selection pass.

    One group-sized hash-agg (map-side partials) + a broadcast one-row
    total; the ``q`` arithmetic is plain double math, reproducible
    cross-engine.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (alpha=1 keeps the natural "
                         "distribution; use small alpha for more uniform)")
    w = (F.sum(F.col(weight_col)).cast("double") if weight_col
         else F.count(F.lit(1)).cast("double"))
    per = df.groupBy(F.col(by).alias("grp")).agg(w.alias("n"))
    tot = per.agg(F.sum("n").alias("_t"))
    p = F.col("n") / F.col("_t")
    # sqrt is IEEE correctly-rounded, pow is not (±1 ulp, engine-specific):
    # the common alpha=0.5 temperature stays bit-identical cross-engine
    pa = F.sqrt(p) if alpha == 0.5 else F.pow(p, F.lit(alpha))
    smoothed = per.crossJoin(F.broadcast(tot)).select(
        "grp", "n", p.alias("p"), pa.alias("_pa"))
    z = smoothed.agg(F.sum("_pa").alias("_z"))
    out = smoothed.crossJoin(F.broadcast(z)).select(
        "grp", "n",
        F.round("p", 6).alias("p"),
        F.round(F.col("_pa") / F.col("_z"), 6).alias("q"))
    if total_budget is not None:
        out = out.withColumn(
            "budget",
            F.floor(F.col("q") * F.lit(float(total_budget))).cast("long"))
    return out.orderBy("grp")


def write_training_shards(df: DataFrame, path: str, key: str,
                          seed: str = "42", shards: int = 256,
                          fmt: str = "parquet") -> None:
    """Materialize :func:`training_order` physically: one
    ``shard=<i>/`` partition directory per shard, rows stored in
    ``pos`` order inside each file — a data loader that walks shard
    directories in index order and streams files sequentially reads the
    EXACT deterministic global shuffle, no sorting at load time.

    Plan shape: hash-repartition on ``shard`` (one shuffle, the same one
    the ``pos`` window needed anyway) + ``sortWithinPartitions`` — there
    is NO global sort; each task sorts only its own shard.  Rerunning
    with the same (seed, key, shards) rewrites byte-identical ordering,
    so a resumed/repeated export is safe to diff or dedupe against.
    """
    ordered = training_order(df, key, seed, shards)
    (ordered.repartition(shards, "shard")
     .sortWithinPartitions("shard", "pos")
     .write.mode("overwrite").partitionBy("shard").format(fmt).save(path))


def upsample_epochs(df: DataFrame, rates: dict[str, float],
                    source_col: str, key: str, seed: str = "42",
                    default_rate: float = 1.0,
                    epoch_col: str = "epoch") -> DataFrame:
    """Deterministic per-source UPSAMPLING — the other half of
    :func:`weighted_mix` (which caps rates at 1 and points rates > 1
    here): a rate of 2.5 yields two full copies of every row plus a
    deterministic hash-chosen half, each copy tagged with an ``epoch``
    number (0, 1, 2, ...).

    The explicit epoch column is the point: downstream dedup/uniqueness
    invariants stay intact (``(key, epoch)`` is unique; filtering
    ``epoch = 0`` recovers the original corpus), and a data loader can
    interleave epochs instead of replaying them back-to-back.

    Fractional tails reuse the :func:`hash_prefix` variate with the
    epoch folded into the seed, so epoch k's tail membership is
    independent of epoch j's, yet every run/engine picks the same rows.
    Map-side only — a ``sequence()`` explode per row, no shuffle, no RNG.
    """
    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {s!r} must be >= 0, got {r}")
    if default_rate < 0:
        raise ValueError("default_rate must be >= 0")
    src = F.col(source_col)
    rate = None
    for s, r in rates.items():
        cond = src == F.lit(s)
        rate = (F.when(cond, F.lit(float(r))) if rate is None
                else rate.when(cond, F.lit(float(r))))
    rate = (F.lit(float(default_rate)) if rate is None
            else rate.otherwise(F.lit(float(default_rate))))
    n_epochs = F.ceil(rate).cast("int")
    out = (df.withColumn("_rate", rate)
           .filter(F.col("_rate") > 0)
           .withColumn(epoch_col,
                       F.explode(F.sequence(F.lit(0), n_epochs - 1))))
    # epoch e keeps the row iff rate - e >= 1 (full epoch) or the hash
    # variate (salted with e) falls under the fractional remainder
    frac = F.col("_rate") - F.col(epoch_col)
    h = hash_prefix(
        F.concat_ws("|", F.col(epoch_col).cast("string"),
                    F.col(key).cast("string")), seed)
    space = float(16 ** _PREFIX_LEN)
    keep = (frac >= 1.0) | (h < F.lpad(F.lower(F.hex(
        F.floor(frac * space).cast("long"))), _PREFIX_LEN, "0"))
    return out.filter(keep).drop("_rate")
