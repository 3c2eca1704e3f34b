"""End-to-end training-data preparation pipeline — the composed path a
pre-training data team runs daily, built entirely from this package's
operators so each stage inherits its scale contract:

    validate → exact dedup → near-dup dedup (MinHash→verify→components)
             → quality filter → sequence packing

Every stage is a lazy DataFrame transformation; nothing is collected.
At 100 TB you materialize between stages (write each stage to a
partitioned table / use plans.manifest for resumability) — pass
``checkpoint=True`` to localCheckpoint stage boundaries in-session,
which also stops Catalyst re-planning the whole lineage per stage.

Stage scale shapes (each documented at its operator):
  validate       one projection over the scan (compiler.py)
  exact_dedup    one shuffle on md5 fingerprint (dedup.py)
  near-dup       banded LSH join, candidates-only verify, component
                 keep-min — never all-pairs (dedup.py, graph.py)
  quality        zero-shuffle codegen projection (textstats.py)
  packing        deterministic shards × in-shard FFD (packing.py)

No counterpart in guyskk/validr (single-value validation only); the
validate stage IS the reference's semantics applied at table scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["prepare_training_data", "PipelineResult"]


@dataclass
class PipelineResult:
    """Lazy handles to the pipeline outputs plus per-stage row counts."""
    kept: DataFrame                       # surviving documents
    packed: DataFrame | None              # bin assignment (id, bin_id, ...)
    stats: list[dict] = field(default_factory=list)

    def stats_df(self, spark):
        return spark.createDataFrame(
            [(s["stage"], s["rows_in"], s["rows_out"]) for s in self.stats],
            "stage string, rows_in long, rows_out long")


def prepare_training_data(
        df: DataFrame, schema=None, *,
        id_col: str = "doc_id", text_col: str = "text",
        len_col: str | None = None, max_tokens: int = 2048,
        near_dup: bool = True, jaccard_threshold: float = 0.8,
        keep_by=None, drop_bad_encoding: bool = False,
        minhash_kwargs: dict | None = None,
        quality_kwargs: dict | None = None,
        pack: bool = True, collect_stats: bool = True,
        checkpoint: bool = False) -> PipelineResult:
    """Run the full prep pipeline; see module docstring for the stages.

    ``schema`` is a validr schema (``T.dict(...)``) — rows with ANY
    violation are dropped (the reference's strict semantics); pass None
    to skip validation.  ``len_col`` supplies token lengths for packing;
    default derives a whitespace token count from ``text_col``.
    ``collect_stats=False`` keeps the whole pipeline a single lazy plan
    (no counting jobs) — the 100 TB default; stats then only record the
    stage names.  ``keep_by`` (a Column, e.g. a quality score) elects
    the highest-scoring member as the dedup survivor in BOTH dedup
    stages instead of the min-id member (ties → min id).
    ``drop_bad_encoding=True`` inserts a zero-shuffle encoding gate
    (operators/encoding.py) right after validation, before any dedup
    work is spent on mojibake rows.
    """
    from validr_spark.operators.dedup import (exact_dedup, jaccard_verify,
                                              minhash_candidates)
    from validr_spark.operators.graph import dedup_by_components
    from validr_spark.operators.packing import pack_greedy
    from validr_spark.operators.textstats import (quality_annotate,
                                                  token_count)

    stats: list[dict] = []

    def step(name, before: DataFrame, after: DataFrame) -> DataFrame:
        if collect_stats:
            stats.append({"stage": name, "rows_in": before.count(),
                          "rows_out": after.count()})
        else:
            stats.append({"stage": name, "rows_in": None, "rows_out": None})
        return after.localCheckpoint(eager=False) if checkpoint else after

    cur = df

    if schema is not None:
        from validr_spark.compiler import SparkCompiler
        plan = SparkCompiler().compile(schema)
        # plan.flag keeps every original column and filters in the same
        # map-side projection — no id round-trip.  The previous anti-join
        # by id was a shuffle AND dropped innocent rows whenever ids were
        # NULL (eqNullSafe matched every NULL-id row against one NULL-id
        # violator) or duplicated.
        flagged = plan.flag(cur, "_pipe_violations")
        clean = (flagged.filter(F.size(F.col("_pipe_violations")) == 0)
                 .drop("_pipe_violations"))
        cur = step("validate", df, clean)

    if drop_bad_encoding:
        from validr_spark.operators.encoding import ENCODING_PATTERNS
        from validr_spark.operators.encoding import encoding_counts
        e = encoding_counts(F.col(text_col))
        tot = None
        for n in ENCODING_PATTERNS:
            tot = e[n] if tot is None else tot + e[n]
        cur = step("encoding", cur, cur.filter(tot == 0))

    deduped = exact_dedup(cur, text_col, id_col, keep_by=keep_by)
    cur = step("exact_dedup", cur, deduped)

    if near_dup:
        mk = dict(minhash_kwargs or {})
        cands = minhash_candidates(cur, text_col, id_col, **mk)
        verified = jaccard_verify(cur, cands, text_col, id_col,
                                  threshold=jaccard_threshold)
        pairs = verified.select("id_a", "id_b")
        kept = dedup_by_components(cur, pairs, id_col=id_col,
                                   keep_by=keep_by)
        cur = step("near_dup", cur, kept)

    qk = dict(quality_kwargs or {})
    # annotate-then-filter, not filter-ids-then-semi-join: the id
    # round-trip silently dropped every NULL-id row (NULL never
    # equi-joins) and cost a shuffle; the annotate form is one map-side
    # projection with no id dependency at all
    flagged_q = quality_annotate(cur, text_col, **qk)
    kept_q = flagged_q.filter(F.col("keep")).drop("keep", "reasons")
    cur = step("quality", cur, kept_q)

    packed = None
    if pack:
        if len_col is None:
            src = cur.withColumn("_ntok", token_count(F.col(text_col)))
            lcol = "_ntok"
        else:
            src, lcol = cur, len_col
        packed = pack_greedy(src, max_tokens, id_col=id_col, len_col=lcol)
        if collect_stats:
            stats.append({"stage": "pack",
                          "rows_in": stats[-1]["rows_out"],
                          "rows_out": packed.count()})
        else:
            stats.append({"stage": "pack", "rows_in": None,
                          "rows_out": None})

    return PipelineResult(kept=cur, packed=packed, stats=stats)
