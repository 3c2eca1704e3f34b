"""Sequence packing — assign documents to fixed-capacity training bins
(context windows) so concatenated sequences waste minimal padding.

The pre-training data-prep step after tokenize/dedup/filter: documents
of n_tok tokens are grouped into bins of capacity ``max_tokens``; each
bin becomes one training sequence (docs joined by a separator, padded to
the context length).  Packing quality = fraction of capacity filled.

Distributed design (10^12 docs):

* Packing is inherently sequential (bin state), so it CANNOT be one
  Catalyst expression — but it parallelizes perfectly across independent
  groups.  ``pack_greedy`` shards docs into ``num_shards`` deterministic
  shards (xxhash64 of the id), then runs greedy next-fit packing inside
  each shard via ``applyInPandas`` — O(shard) state, Arrow-batched, no
  driver involvement.  Bin ids are globally unique ((shard, local_bin)).
* Greedy-by-arrival within a shard is the streaming-friendly choice; for
  tighter packing pass ``sort_within_shard=True`` (first-fit-decreasing
  flavor: packs the shard's docs longest-first, classic ~11/9 OPT bound
  vs unbounded for arbitrary arrival order).
* Oversized docs (n_tok > max_tokens) are flagged into their own
  single-doc bins with ``truncated = true`` — the caller decides whether
  to split or drop them; silently dropping data in a packer is how
  training sets lose their long-document tail.

Determinism: shard assignment and within-shard order are pure functions
of (id, n_tok), so re-runs produce identical bins — required for
resumable pipelines (plans/manifest.py lineage).

No counterpart in guyskk/validr (no notion of sequences or packing).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as st

__all__ = ["pack_greedy", "packing_stats", "repartition_by_weight",
           "repartition_by_tokens", "take_weight_budget",
           "take_token_budget", "take_grouped_budgets",
           "take_token_budgets", "length_buckets", "context_overflow"]


def _coarse_running_sum(tmp, g_col: str, order_cols,
                        group_col: str | None = None):
    """Shared driver-side prefix-sum core: global running cumulative sum
    of ``_wt`` within each logical stream (one stream per ``group_col``
    value, or a single stream), where the stream is chunked into coarse
    ``g_col`` groups.  Only per-(group, chunk) totals reach the driver —
    never rows.  Chunk offsets are prefix-summed in sorted chunk order,
    so when the chunk key is a PREFIX of the in-chunk sort key (hex
    prefix of the hash), the result is the exact running sum of the
    whole stream in that total order.

    Returns ``(cum_column, grand_total)``; the cum column is INCLUSIVE
    of the current row.
    """
    from pyspark.sql import Window

    sep = "\x00"
    null_tag = "\x01NULL"
    part = ([group_col] if group_col else []) + [g_col]
    # The offset-map keys must be rendered by SPARK's string cast, not
    # Python's str(): they disagree for booleans ('true' vs 'True'),
    # floats, decimals... — a mismatch makes element_at return NULL and
    # the caller's budget filter silently drop every row.  So the group
    # key is cast (NULL-coalesced) inside the aggregate itself and the
    # driver never re-renders it.
    if group_col:
        gexpr = F.coalesce(F.col(group_col).cast("string"),
                           F.lit(null_tag))
        agg_keys = [gexpr.alias("_grpkey"), F.col(g_col)]
    else:
        gexpr = F.lit("")
        agg_keys = [F.col(g_col)]
    totals: dict = {}
    for r in tmp.groupBy(*agg_keys).agg(F.sum("_wt").alias("t")).collect():
        grp = r["_grpkey"] if group_col else ""
        totals.setdefault(grp, {})[r[g_col]] = r["t"] or 0
    off_pairs, grand = [], 0
    for grp in sorted(totals):
        run = 0
        by_g = totals[grp]
        for gk in sorted(by_g):
            off_pairs += [F.lit(f"{grp}{sep}{gk}"), F.lit(run)]
            run += by_g[gk]
        grand += run
    off_map = F.create_map(*off_pairs) if off_pairs else F.create_map()
    key = F.concat_ws(sep, gexpr, F.col(g_col).cast("string"))
    w = (Window.partitionBy(*part).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return F.element_at(off_map, key) + F.sum("_wt").over(w), grand


def repartition_by_weight(df: DataFrame, weight, target: int,
                          coarse_groups: int = 256,
                          order=None) -> DataFrame:
    """Greedy weight-aware repartition: rows are packed into buckets by a
    cumulative sum of ``weight`` (distributed prefix-sum), so per-task
    payload is bounded by ``target`` + one row — regardless of row-count
    skew (a count-balanced repartition would happily put a 4 GB video or
    a 1M-token document in a normal-sized bucket).

    Shape (no global sort, no single-reducer window):
      1. rows → ``coarse_groups`` hash groups; per-group weight totals
         are collected to the driver (``coarse_groups`` longs, never
         rows);
      2. driver prefix-sums the totals into per-group offsets;
      3. within each group, a bounded window computes the running weight
         sum in deterministic ``order`` (default: xxhash64 of all
         columns); global start = group offset + running sum − weight;
      4. bucket = floor(start / target); range-repartition on it.

    Used by :func:`repartition_by_tokens` (token-balanced training
    shards) and ``multimodal.repartition_by_size`` (byte-balanced media
    tasks).  The BUCKET ASSIGNMENT is deterministic for a fixed input
    (resumable-run safe); the final ``repartitionByRange`` maps buckets
    to tasks by SAMPLED boundaries, so physical partition numbering can
    vary between runs and, rarely, two adjacent buckets can share a
    task (≤ 2× target + one row) — bound violations beyond that are
    impossible because the bucket ids themselves are exact.
    """
    if target <= 0:
        raise ValueError("repartition_by_weight: target must be positive")
    wt = weight.cast("long")
    h = order if order is not None else F.xxhash64(*df.columns)
    tmp = (df.withColumn("_wt", F.coalesce(wt, F.lit(0)))
           .withColumn("_h", h)
           .withColumn("_g", F.pmod(F.col("_h"), F.lit(coarse_groups))
                       .cast("int")))
    cum, grand = _coarse_running_sum(tmp, "_g", [F.col("_h")])
    n_buckets = max(1, -(-grand // target))
    bucketed = tmp.withColumn(
        "_bucket", F.floor((cum - F.col("_wt")) / F.lit(target))
        .cast("int"))
    return (bucketed.repartitionByRange(n_buckets, F.col("_bucket"))
            .select(*df.columns))


def take_weight_budget(df: DataFrame, budget: int, weight,
                       id_col: str = "doc_id",
                       seed: str = "42") -> DataFrame:
    """Deterministic budgeted corpus cut: keep the first rows in
    ``md5(seed|id)`` order whose cumulative ``weight`` stays within
    ``budget`` (a row that would cross the budget is dropped — strict).

    The "give me exactly ~B tokens of this corpus" step of a training-mix
    recipe, done as a *selection rule* rather than a fraction: a
    fraction-based sample under- or over-shoots by the length
    distribution, and a limit-after-sort needs a global sort.  md5 order
    makes the cut (a) uniform-random w.r.t. content, (b) identical on
    rerun/resume, and (c) *monotone under growth* — the kept set is
    always a prefix of the same (hash, id) total order, so adding rows
    to the corpus only moves the cut threshold earlier: the old
    selection shrinks from its hash-order tail, never reshuffles.

    Weights must be non-negative (token/byte/char counts are); a
    negative weight would make the running sum non-monotone and the
    "maximal prefix" selection ill-defined.

    Distributed shape (no global sort, no single-reducer window): the
    first two hex chars of the hash split rows into 256 groups that are
    CONTIGUOUS ranges of the sort order, so per-group totals prefix-sum
    on the driver into exact global offsets (256 longs, never rows);
    each group then needs only a bounded in-group running sum.
    """
    if budget < 0:
        raise ValueError("take_weight_budget: budget must be >= 0")
    wt = F.coalesce(weight.cast("long"), F.lit(0))
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    tmp = (df.withColumn("_wt", wt).withColumn("_h", h)
           .withColumn("_g", F.substring("_h", 1, 2)))
    cum, _ = _coarse_running_sum(tmp, "_g", [F.col("_h"), F.col(id_col)])
    return (tmp.withColumn("_cum", cum)
            .filter(F.col("_cum") <= F.lit(budget))
            .select(*df.columns))


def take_token_budget(df: DataFrame, budget_tokens: int,
                      token_col: str = "n_tok",
                      id_col: str = "doc_id",
                      seed: str = "42") -> DataFrame:
    """:func:`take_weight_budget` with weight = token count: a strict
    ~``budget_tokens``-sized, deterministic, content-uniform cut of the
    sequence corpus."""
    return take_weight_budget(df, budget_tokens, F.col(token_col),
                              id_col, seed)


def take_grouped_budgets(df: DataFrame, budgets: dict, weight,
                         group_col: str = "source",
                         id_col: str = "doc_id",
                         seed: str = "42") -> DataFrame:
    """Per-group budgeted cuts in one pass — the mixture-recipe step
    ("30B tokens of web + 5B of code + 1B of wiki"): for every group
    value in ``budgets``, keep the maximal md5-order prefix of that
    group whose cumulative ``weight`` fits the group's budget.  Rows
    whose group is not in ``budgets`` are dropped.

    ``budgets`` keys must be STRINGS and are matched against the group
    column's Spark string form — enforcing this beats silently matching
    nothing when Python's repr of a key (``1``, ``True``) differs from
    Spark's cast (``1.0``, ``true``).

    Same distributed shape as :func:`take_weight_budget`, with the
    coarse prefix-sum done per (group, hex-prefix): the driver holds
    ``len(budgets) × 256`` longs, never rows.  Each group's selection is
    identical to running :func:`take_weight_budget` on that group alone
    (md5 order is per-row, so filtering commutes with it) — but the
    corpus is scanned once, not once per group.
    """
    if not budgets:
        raise ValueError("take_grouped_budgets: budgets must be non-empty")
    bad = [k for k in budgets if not isinstance(k, str)]
    if bad:
        raise TypeError(
            "take_grouped_budgets: budget keys must be strings matching "
            f"the group column's string form, got {bad!r}")
    wt = F.coalesce(weight.cast("long"), F.lit(0))
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    tmp = (df.filter(F.col(group_col).cast("string")
                     .isin(list(budgets)))
           .withColumn("_wt", wt).withColumn("_h", h)
           .withColumn("_g", F.substring("_h", 1, 2)))
    cum, _ = _coarse_running_sum(tmp, "_g", [F.col("_h"), F.col(id_col)],
                                 group_col=group_col)
    bexpr = None
    for k, b in budgets.items():
        cond = F.col(group_col).cast("string") == F.lit(k)
        lit = F.lit(int(b))
        bexpr = F.when(cond, lit) if bexpr is None else bexpr.when(cond, lit)
    return (tmp.withColumn("_cum", cum)
            .filter(F.col("_cum") <= bexpr)
            .select(*df.columns))


def take_token_budgets(df: DataFrame, budgets: dict,
                       token_col: str = "n_tok",
                       group_col: str = "source",
                       id_col: str = "doc_id",
                       seed: str = "42") -> DataFrame:
    """:func:`take_grouped_budgets` with weight = token count: the
    per-domain token-budget mixture cut of the sequence corpus."""
    return take_grouped_budgets(df, budgets, F.col(token_col),
                                group_col, id_col, seed)


def repartition_by_tokens(df: DataFrame, target_tokens: int,
                          token_col: str = "n_tok",
                          coarse_groups: int = 256) -> DataFrame:
    """Token-balanced training shards: repartition the sequence table so
    every task/output file carries ≈``target_tokens`` tokens (bounded by
    ``target_tokens`` + one document), not ≈equal ROW counts — with
    heavy-tailed document lengths, count-balanced shards vary several ×
    in token load, which is exactly the straggler/OOM profile a
    100 TB write wants to avoid.  Write the result with one file per
    partition for even shards."""
    return repartition_by_weight(df, F.col(token_col), target_tokens,
                                 coarse_groups)


def pack_greedy(df: DataFrame, max_tokens: int,
                id_col: str = "doc_id", len_col: str = "n_tok",
                num_shards: int = 256,
                sort_within_shard: bool = True,
                shard_col: str | None = None) -> DataFrame:
    """Assign each doc a bin: (id, n_tok, shard, bin_id, truncated).

    ``bin_id`` is a globally-unique string "<shard>/<local bin>"; docs
    with the same bin_id form one training sequence (their n_tok sums to
    ≤ max_tokens, except single-doc ``truncated`` bins).

    ``shard_col`` overrides the default xxhash64 shard assignment with an
    existing integer column — for pre-bucketed tables (pack inside each
    bucket with zero extra shuffle) or when the sharding must be
    replayable by another engine (the pack_stats oracle uses ``id % k``;
    xxhash64 has no DuckDB counterpart).  Values must be non-NULL and
    lie in [0, num_shards) — violations raise a clear executor-side
    ValueError instead of silently producing phantom shards (out of
    range) or an opaque NaN→int cast failure (NULL).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    out_schema = st.StructType([
        st.StructField("id", st.StringType()),
        st.StructField("n_tok", st.LongType()),
        st.StructField("shard", st.IntegerType()),
        st.StructField("bin_id", st.StringType()),
        st.StructField("truncated", st.BooleanType()),
    ])
    shard_expr = (F.col(shard_col).cast("int") if shard_col is not None
                  else F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                              F.lit(num_shards)).cast("int"))
    src = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(len_col).cast("long").alias("n_tok"),
        shard_expr.alias("shard"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["shard"].isna().any():
            raise ValueError(
                f"pack_greedy: shard_col {shard_col!r} contains NULL "
                "values; shard assignments must be non-NULL integers "
                f"in [0, {num_shards})")
        shard = int(pdf["shard"].iloc[0])
        if not 0 <= shard < num_shards:
            raise ValueError(
                f"pack_greedy: shard_col {shard_col!r} value {shard} "
                f"is outside [0, num_shards={num_shards})")
        # deterministic within-shard order regardless of arrival order
        if sort_within_shard:
            pdf = pdf.sort_values(["n_tok", "id"],
                                  ascending=[False, True])
        else:
            pdf = pdf.sort_values("id")
        bins, fill, next_bin = [], 0, 0
        truncated = []
        cur = -1
        for n in pdf["n_tok"].to_numpy():
            n = int(n) if n == n else 0          # NaN-safe
            if n > max_tokens:
                bins.append(f"{shard}/{next_bin}")
                truncated.append(True)
                next_bin += 1
                continue
            if cur < 0 or fill + n > max_tokens:
                cur = next_bin
                next_bin += 1
                fill = 0
            fill += n
            bins.append(f"{shard}/{cur}")
            truncated.append(False)
        pdf = pdf.assign(bin_id=bins, truncated=truncated)
        return pdf[["id", "n_tok", "shard", "bin_id", "truncated"]]

    return src.groupBy("shard").applyInPandas(pack, schema=out_schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row packing quality report: n_bins, n_docs, total_tokens,
    utilization (tokens / (n_bins × capacity), truncated bins excluded
    from the denominator's capacity accounting), n_truncated."""
    per_bin = (packed.groupBy("bin_id")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tok").alias("tok"),
                    F.max(F.col("truncated").cast("int")).alias("trunc")))
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
        # 0.0 (not NULL) when every bin is truncated: the 0-denominator
        # division would otherwise surface as a null metric in the
        # dataset card.
        F.coalesce(
            F.round(F.sum(F.when(F.col("trunc") == 0, F.col("tok")))
                    / (F.sum((F.col("trunc") == 0).cast("long"))
                       * F.lit(max_tokens)), 6),
            F.lit(0.0)).alias("utilization"),
        F.sum("trunc").cast("long").alias("n_truncated"))


def length_buckets(df: DataFrame, num_buckets: int = 8,
                   len_col: str = "n_tok") -> DataFrame:
    """Batch-shape planner: split the sequence-length distribution into
    ``num_buckets`` near-equal-count buckets and report each bucket's
    padding waste when batches are padded to the bucket max — the
    pre-flight for choosing bucketed-batching boundaries (vs packing)
    in a training dataloader.

    Output per bucket: ``(bucket, n_seqs, min_len, max_len,
    total_tokens, padded_tokens, waste_ppm)`` where ``padded_tokens =
    n_seqs * max_len`` (every sequence padded to the bucket's longest)
    and ``waste_ppm`` is the integer ppm of padded work that is padding.

    Boundaries come from the LENGTH HISTOGRAM, not a global row sort:
    bucket(len) = floor(rows_before(len) * k / N), so all rows of one
    length land in one bucket and each bucket holds ~N/k rows when
    lengths are diverse (degenerate single-length spikes stay whole —
    documented, not split).  Exact, deterministic, and SQL-replayable.

    Shape at scale: one hash aggregate to the ≤ max_len-row histogram,
    one window over THAT histogram (thousands of rows — the single
    partition is the tiny side, never the data), one broadcast join
    back, one final aggregate to k rows.  No global sort of row-shaped
    data, no Python.  NULL lengths are excluded (validate first).
    """
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    ln = F.col(len_col)
    hist = (df.filter(ln.isNotNull()).groupBy(ln.alias("_len"))
            .agg(F.count(F.lit(1)).alias("_n")))
    w = (Window.orderBy("_len")
         .rowsBetween(Window.unboundedPreceding, -1))
    total = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    assigned = hist.select(
        "_len", "_n",
        F.floor(F.coalesce(F.sum("_n").over(w), F.lit(0))
                * num_buckets / F.sum("_n").over(total))
        .cast("int").alias("bucket"))
    per = (assigned.groupBy("bucket")
           .agg(F.sum("_n").alias("n_seqs"),
                F.min("_len").cast("long").alias("min_len"),
                F.max("_len").cast("long").alias("max_len"),
                F.sum(F.col("_len") * F.col("_n")).alias("total_tokens")))
    padded = F.col("n_seqs") * F.col("max_len")
    # try_divide + coalesce: an all-zero-length bucket has padded = 0,
    # and a bare division is an ANSI DIVIDE_BY_ZERO abort (Spark 4
    # default); report 0 waste, not NULL — packing_stats convention.
    # The ×1e6 runs in DOUBLE: a long numerator would overflow (ANSI
    # abort) past ~9.2e12 padded tokens — mid-size for this module's
    # target scale; doubles are exact here until 2^53/1e6 ≈ 9e9 and a
    # ±1 ppm wobble beyond that is fine for a waste metric.
    return (per.select(
        "bucket", "n_seqs", "min_len", "max_len", "total_tokens",
        padded.alias("padded_tokens"),
        F.coalesce(
            F.floor(F.try_divide(
                (padded - F.col("total_tokens")).cast("double") * 1000000,
                padded.cast("double"))),
            F.lit(0)).cast("long").alias("waste_ppm"))
        .orderBy("bucket"))


def context_overflow(df: DataFrame, cutoffs=(1024, 2048, 4096, 8192),
                     len_col: str = "n_tok",
                     group_col: str | None = None) -> DataFrame:
    """Context-length overflow audit: for each candidate context length,
    how many sequences exceed it and how many tokens truncation would
    lose — the "what does context L cost us" table that picks the
    training context (and decides between truncate / :mod:`chunking` /
    drop) before :func:`pack_greedy` commits to a window size.

    Output per (group?, cutoff): ``(group?, cutoff, n_seqs, n_over,
    over_ppm, tokens_total, tokens_lost, lost_ppm)`` — integers and
    integer-ppm ratios only.  NULL lengths are excluded (validate
    first).

    Shape at scale: ONE aggregation pass computes every cutoff's
    conditional sums as separate agg columns (map-side partials), then
    the per-cutoff rows are exploded from the group-sized result —
    len(cutoffs) never multiplies the scan or the shuffle.
    """
    cutoffs = sorted(set(int(c) for c in cutoffs))
    if not cutoffs or cutoffs[0] <= 0:
        raise ValueError("cutoffs must be positive ints")
    ln = F.col(len_col).cast("long")
    base = df.filter(ln.isNotNull())
    keys = [F.col(group_col)] if group_col else []
    aggs = [F.count(F.lit(1)).alias("_n"), F.sum(ln).alias("_tot")]
    for c in cutoffs:
        aggs.append(F.sum((ln > c).cast("long")).alias(f"_over_{c}"))
        aggs.append(F.sum(F.greatest(ln - c, F.lit(0)))
                    .alias(f"_lost_{c}"))
    per = base.groupBy(*keys).agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("cutoff"),
                 F.col(f"_over_{c}").alias("n_over"),
                 F.col(f"_lost_{c}").alias("tokens_lost"))
        for c in cutoffs])
    out_keys = [group_col] if group_col else []
    ex = per.select(*out_keys, F.col("_n"), F.col("_tot"),
                    F.explode(rows).alias("_c"))
    # ppm numerators multiply in DOUBLE, not long: at the module's
    # 10^12-token target scale `count * 1000000` overflows int64 (ANSI
    # abort); exact as doubles until 2^53/1e6, ±1 ppm beyond
    return ex.select(
        *out_keys,
        F.col("_c")["cutoff"].alias("cutoff"),
        F.col("_n").alias("n_seqs"),
        F.col("_c")["n_over"].alias("n_over"),
        F.floor(F.coalesce(F.try_divide(
            F.col("_c")["n_over"].cast("double") * 1000000,
            F.col("_n").cast("double")), F.lit(0.0)))
        .cast("long").alias("over_ppm"),
        F.col("_tot").alias("tokens_total"),
        F.col("_c")["tokens_lost"].alias("tokens_lost"),
        F.floor(F.coalesce(F.try_divide(
            F.col("_c")["tokens_lost"].cast("double") * 1000000,
            F.col("_tot").cast("double")), F.lit(0.0)))
        .cast("long").alias("lost_ppm"))
