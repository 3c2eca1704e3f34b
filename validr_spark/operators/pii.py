"""PII detection and redaction over text columns.

A training-data pipeline must find and scrub personally-identifying
strings before anything ships to a model.  This module does it with pure
Catalyst regex expressions — `regexp_count` / `regexp_replace` run inside
whole-stage codegen, zero Python per row, no shuffle: the whole scan+scrub
is a map-side projection that composes with column pruning and pushdown at
any scale.

The pattern set deliberately sticks to the Java-regex ∩ RE2 dialect
subset (no lookaround, no backreferences) so the exact same patterns run
in Spark, DuckDB, Go, and the validation oracle — counting and redaction
are auditable cross-engine (see `__spark_entry__.oracle_sql`'s pii
queries).  Both engines scan leftmost non-overlapping, so counts match.

Related: the *validator* layer (rules.py email/ipv4/uuid/phone) answers
"is this whole value an X" with full-anchored, canonicalizing semantics;
this module answers "does this free text *contain* an X" — looser
patterns by design (scrubbing wants recall; validation wants precision).

Reference parity note: guyskk/validr has no free-text scanning (it is a
per-value validator — _validator_c.pyx:str_validator); this module is part
of the distributed-pipeline layer the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "REDACT_ORDER", "pii_counts", "pii_scan",
           "pii_redact", "pii_prevalence"]

# Java ∩ RE2 compatible: no lookaround, no backrefs. \b is an ASCII word
# boundary in both.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}",
    "uuid": (r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
             r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b"),
    "ipv4": (r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
             r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b"),
    "ipv6": r"\b(?:[0-9A-Fa-f]{1,4}:){3,7}[0-9A-Fa-f]{1,4}\b",
    "credit_card": r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b|\b[0-9]{16}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # intl numbers with an explicit +CC prefix only — bare digit runs are
    # hopelessly ambiguous in web text (dates, ids, prices)
    "phone": r"\+[0-9]{1,3}[ -]?[0-9]{3,4}[ -]?[0-9]{3,4}(?:[ -]?[0-9]{2,4})?",
}

# Longest/most-specific first so redaction never splits a wider match into
# pieces a later pattern re-matches (e.g. a uuid's hex groups are not
# digit-run bait once replaced).
REDACT_ORDER = ["email", "uuid", "ipv6", "ipv4", "credit_card", "ssn",
                "phone"]


def pii_counts(col: Column | str) -> Column:
    """struct<email:int, uuid:int, ...> — per-class non-overlapping match
    counts in one projection (one codegen'd regex pass per class)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.struct(*[
        F.regexp_count(col, F.lit(pat)).alias(name)
        for name, pat in PII_PATTERNS.items()
    ])


def pii_scan(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document PII audit: one row per doc with per-class counts,
    total and a has_pii flag.  Map-side only."""
    c = pii_counts(text_col)
    out = df.select(F.col(id_col), c.alias("_p"))
    names = list(PII_PATTERNS)
    total = sum((F.col("_p")[n] for n in names[1:]),
                F.col("_p")[names[0]])
    return out.select(
        id_col,
        *[F.col("_p")[n].alias(f"n_{n}") for n in names],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def pii_redact(df: DataFrame, text_col: str = "text",
               classes: list[str] | None = None,
               out_col: str | None = None,
               fmt: str = "[{}]") -> DataFrame:
    """Replace every PII match with a typed placeholder (``[EMAIL]`` ...).

    Chained `regexp_replace` in REDACT_ORDER — still a single map-side
    projection (Catalyst collapses the chain into one codegen stage).
    """
    classes = REDACT_ORDER if classes is None else [
        c for c in REDACT_ORDER if c in classes]
    col = F.col(text_col)
    for name in classes:
        col = F.regexp_replace(col, F.lit(PII_PATTERNS[name]),
                               F.lit(fmt.format(name.upper())))
    return df.withColumn(out_col or text_col, col)


def pii_prevalence(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level audit: per class, number of docs containing it and
    total match count.  Partial-aggregated map-side; the shuffle carries
    |classes| rows."""
    c = pii_counts(text_col)
    tmp = df.select(c.alias("_p"))
    aggs = []
    for n in PII_PATTERNS:
        aggs.append(F.sum((F.col("_p")[n] > 0).cast("long")).alias(f"docs_{n}"))
        aggs.append(F.sum(F.col("_p")[n]).alias(f"hits_{n}"))
    return tmp.agg(F.count(F.lit(1)).alias("n_docs"), *aggs)
