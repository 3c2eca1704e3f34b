"""DSIR-style importance resampling: select raw documents that look like
a target corpus (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023).

Two pieces, composable with everything in this package:

* :func:`dsir_weights` — per-document log importance weight
  ``mean_w [log2 p_target(w) − log2 p_raw(w)]`` under two unigram
  bag-of-words models (the paper uses hashed n-gram features; word
  unigrams keep the oracle exact and match
  :func:`~validr_spark.operators.textstats.unigram_logprob`'s feature
  space).  Documents whose word distribution resembles the target score
  high; boilerplate/spam scores low.
* :func:`importance_sample` — Gumbel top-k resampling WITHOUT
  replacement: ``key = log_weight / temperature + Gumbel(u)`` with the
  uniform ``u`` derived from ``md5(seed|id)`` (same deterministic-hash
  randomness as operators/sampling.py — reruns and resumed runs select
  the identical set, no RNG state to checkpoint).

Scale posture (10^12 docs): the target corpus is small by construction
(a curated sample), so its model always broadcasts; the raw model uses
the ``top_v`` broadcast-head mode from ``unigram_logprob`` (PERF.md
Finding 9) so scoring is explode → two broadcast joins → per-doc agg —
no corpus-wide shuffle on the word key.  Selection is a single
TakeOrderedAndProject (no global sort).  ``top_v=None`` is the exact
mode used by tests and the DuckDB oracle.

No counterpart in guyskk/validr (single-value validation only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _PREFIX_LEN, hash_prefix
from .textstats import words_of

_U_DENOM = float(1 << (4 * _PREFIX_LEN))      # 8 hex chars = 2^32


def _unigram_counts(corpus: DataFrame,
                    text_col: str) -> tuple[DataFrame, DataFrame]:
    """Full ``(word, _c)`` count table + 1-row total ``_n`` (sum of
    counts) from a corpus.  The total always covers the FULL corpus so
    head-mode probabilities stay consistent with exact mode (truncation
    only drops tail words to the smoothing floor)."""
    w = (corpus.select(F.explode(words_of(F.col(text_col))).alias("_w"))
         .filter(F.col("_w") != ""))
    counts = w.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    total = counts.agg(F.sum("_c").alias("_n"))
    return counts, total


def _head(counts: DataFrame, top_v: int | None) -> DataFrame:
    return (counts.orderBy(F.desc("_c"), "_w").limit(top_v)
            if top_v is not None else counts)


def dsir_weights(df: DataFrame, target: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 target_text_col: str | None = None,
                 top_v: int | None = None,
                 oov_alpha: float = 0.5) -> DataFrame:
    """Per-document DSIR log importance weight of ``df`` (the raw corpus)
    toward ``target`` (the curated corpus whose distribution we want).

    Returns ``(id, n_words, log_weight)`` with ``log_weight =
    mean_w [log2 p_target(w) − log2 p_raw(w)]`` (mean, not sum, so the
    weight is length-invariant; ``temperature`` in
    :func:`importance_sample` rescales it).  Both models are add-α
    smoothed over the SHARED vocabulary (the union of both corpora's
    words): ``p(w) = (c + α) / (N + α·V)``.  The shared ``V`` is what
    makes the two floors comparable — with naive per-model floors a
    small target corpus makes "unseen in target" (``α/N_t``) MORE
    likely than a singleton in a big raw corpus (``1/N_r``), so
    rare-vocabulary junk gets boosted instead of penalized.

    ``top_v``: truncate BOTH models to their V most frequent words and
    broadcast (the 10^12-doc path); ``None`` = exact join mode.  Every
    scored word comes from the raw corpus, so its true raw count is
    ≥ 1; in head mode a word missing from the raw head is therefore
    treated as a raw SINGLETON (count 1), and a word missing from the
    target head falls to the smoothing floor (count 0) — the same
    values exact mode assigns to a tail singleton, so head mode only
    approximates the counts of truncated NON-singleton tail words.
    (Coalescing the raw count to 0 instead would hand out-of-both-heads
    junk a near-neutral weight — the exact boost the shared-``V``
    design exists to prevent.)
    """
    tcol = target_text_col or text_col
    t_counts, t_total = _unigram_counts(target, tcol)
    r_counts, r_total = _unigram_counts(df, text_col)
    # shared smoothing vocabulary: distinct words across BOTH corpora —
    # an agg over the (already aggregated) count tables, not the corpus
    vocab = (t_counts.select("_w").union(r_counts.select("_w")).distinct()
             .agg(F.count(F.lit(1)).alias("_v")))
    t_model = _head(t_counts, top_v).withColumnRenamed("_c", "_c_t")
    r_model = _head(r_counts, top_v).withColumnRenamed("_c", "_c_r")
    if top_v is not None:
        t_model, r_model = F.broadcast(t_model), F.broadcast(r_model)
    else:
        # the target corpus is a curated sample — small by construction
        t_model = F.broadcast(t_model)

    wrds = (df.select(F.col(id_col),
                      F.explode(words_of(F.col(text_col))).alias("_w"))
            .filter(F.col("_w") != ""))
    scored = (wrds
              .join(t_model, "_w", "left")
              .join(r_model, "_w", "left")
              .crossJoin(F.broadcast(t_total.select(
                  F.col("_n").alias("_n_t"))))
              .crossJoin(F.broadcast(r_total.select(
                  F.col("_n").alias("_n_r"))))
              .crossJoin(F.broadcast(vocab)))
    a = F.lit(float(oov_alpha))
    # raw words truncated out of the head are singletons w.h.p. → 1;
    # in exact mode _c_r is never NULL (the word came from the raw
    # corpus), so the coalesce is inert there.
    lp_t = F.log2((F.coalesce(F.col("_c_t"), F.lit(0)) + a)
                  / (F.col("_n_t") + a * F.col("_v")))
    lp_r = F.log2((F.coalesce(F.col("_c_r"), F.lit(1)) + a)
                  / (F.col("_n_r") + a * F.col("_v")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.round(F.avg(lp_t - lp_r), 6).alias("log_weight")))


def importance_sample(weights: DataFrame, k: int,
                      weight_col: str = "log_weight",
                      id_col: str = "doc_id",
                      temperature: float = 1.0,
                      seed: str = "42") -> DataFrame:
    """Gumbel top-k sampling without replacement: select ``k`` rows with
    probability proportional to ``exp(weight / temperature)`` (softmax),
    deterministically.

    ``key = weight/temperature + Gumbel`` where ``Gumbel =
    −ln(−ln(u))`` and ``u ∈ (0,1)`` comes from the first 8 hex chars of
    ``md5(seed|id)`` — the operators/sampling.py determinism contract:
    independent of partitioning, stable across reruns/resumes, and
    reproducible in plain SQL (the DuckDB oracle).  ``temperature → 0``
    approaches deterministic top-k by weight; large ``temperature``
    approaches uniform sampling.

    One map-side expression per row + one TakeOrderedAndProject — no
    global sort, no driver-side state.  Output adds ``sample_key``
    (rounded to 6 dp; ties broken by id for cross-engine determinism).
    """
    if k <= 0:
        raise ValueError("importance_sample: k must be positive")
    if temperature <= 0:
        raise ValueError("importance_sample: temperature must be > 0")
    u = ((F.conv(hash_prefix(F.col(id_col), seed), 16, 10)
          .cast("double") + F.lit(0.5)) / F.lit(_U_DENOM))
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col(weight_col) / F.lit(float(temperature)) + gumbel, 6)
    return (weights.withColumn("sample_key", key)
            .orderBy(F.desc("sample_key"), id_col)
            .limit(k))


def dsir_select(df: DataFrame, target: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                target_text_col: str | None = None,
                top_v: int | None = None, temperature: float = 1.0,
                seed: str = "42", oov_alpha: float = 0.5) -> DataFrame:
    """weights + sample in one call: the DSIR paper's pipeline (estimate
    importance weights on the raw corpus, Gumbel-resample k documents).
    Returns ``(id, n_words, log_weight, sample_key)`` for the selected k.

    Documents with no words (empty/whitespace-only/NULL text) carry no
    evidence either way; they enter the draw with the neutral weight 0
    and ``n_words = 0`` rather than being silently unselectable."""
    w = dsir_weights(df, target, text_col, id_col, target_text_col,
                     top_v, oov_alpha)
    w = (df.select(id_col).join(w, id_col, "left")
         .withColumn("n_words",
                     F.coalesce(F.col("n_words"), F.lit(0).cast("long")))
         .withColumn("log_weight",
                     F.coalesce(F.col("log_weight"), F.lit(0.0))))
    return importance_sample(w, k, "log_weight", id_col, temperature, seed)
