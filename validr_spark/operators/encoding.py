"""Encoding hygiene for text columns: replacement chars, stray control
bytes, mojibake, zero-width characters.

Web-scale corpora arrive through many decode paths (HTML scrapes, PDF
extraction, double-decoded databases); a training pipeline has to find the
rows where that went wrong before they poison the tokenizer.  Everything
here is a pure Catalyst `regexp_count` projection — whole-stage codegen,
zero Python per row, zero shuffle for the per-doc scan; the corpus report
is one partial-aggregated pass whose shuffle carries |group| rows.

Pattern dialect: the Java-regex ∩ RE2 subset (same policy as
operators/pii.py) with `\\x{hhhh}` hex escapes, which both Java and RE2
accept verbatim — the identical pattern strings run in Spark and in the
DuckDB oracle (see __spark_entry__.oracle_sql's encoding query).

Classes detected:

- ``replacement`` — U+FFFD, what a strict decoder emits for undecodable
  bytes; any occurrence means content was already lost upstream.
- ``control`` — C0 control chars other than tab/newline/carriage-return,
  plus DEL: binary junk or transfer corruption inside "text".
- ``mojibake`` — the classic UTF-8-bytes-read-as-Latin-1 signatures:
  ``Ã``/``Â``/``Ä``…``Å`` followed by a Latin-1 continuation char (the
  decoded image of a two-byte UTF-8 sequence), and ``â€`` (image of the
  E2-80-xx punctuation block: ’ “ ” – —).
- ``zero_width`` — ZWSP/ZWNJ/ZWJ/BOM-in-body: invisible chars that split
  tokens and leak into generated text.

Reference parity note: guyskk/validr validates *values* (str_validator
checks length/pattern once a value decoded — _validator_c.pyx); corpus
encoding forensics is part of the distributed-pipeline layer this repo
adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ENCODING_PATTERNS", "encoding_counts", "encoding_scan",
           "encoding_report"]

# A UTF-8 continuation byte (0x80-0xBF) mis-decoded shows up as its
# Latin-1 image (U+0080-U+00BF) OR, far more often in the wild, its
# cp1252 image: 0x80-0x9F map to the Windows punctuation/letter block
# (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ” • – — ˜ ™ š › œ ž Ÿ).
_CONT = (r"[\x{0080}-\x{00BF}\x{20AC}\x{201A}\x{0192}\x{201E}\x{2026}"
         r"\x{2020}\x{2021}\x{02C6}\x{2030}\x{0160}\x{2039}\x{0152}"
         r"\x{017D}\x{2018}\x{2019}\x{201C}\x{201D}\x{2022}\x{2013}"
         r"\x{2014}\x{02DC}\x{2122}\x{0161}\x{203A}\x{0153}\x{017E}"
         r"\x{0178}]")

# Java ∩ RE2: character classes + \x{hhhh} escapes only, no lookaround.
ENCODING_PATTERNS: dict[str, str] = {
    "replacement": r"\x{FFFD}",
    # C0 minus \t \n \r, plus DEL
    "control": r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}]",
    # Lead char image of a 2-byte UTF-8 sequence (Â Ã Ä Å) or of the
    # 3-byte E2 punctuation block (â), followed by a continuation image.
    "mojibake": r"[\x{00C2}-\x{00C5}\x{00E2}]" + _CONT,
    "zero_width": r"[\x{200B}-\x{200D}\x{FEFF}]",
}


def encoding_counts(col: Column | str) -> Column:
    """struct<replacement:int, control:int, mojibake:int, zero_width:int>
    — non-overlapping match counts, one codegen regex pass per class."""
    col = F.col(col) if isinstance(col, str) else col
    return F.struct(*[
        F.regexp_count(col, F.lit(pat)).alias(name)
        for name, pat in ENCODING_PATTERNS.items()
    ])


def encoding_scan(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document encoding audit: one row per doc with per-class counts
    and an ``is_clean`` flag.  Map-side only — composes with pushdown and
    column pruning; filter on ``NOT is_clean`` to quarantine."""
    c = encoding_counts(text_col)
    out = df.select(F.col(id_col), c.alias("_e"))
    names = list(ENCODING_PATTERNS)
    total = sum((F.col("_e")[n] for n in names[1:]), F.col("_e")[names[0]])
    return out.select(
        id_col,
        *[F.col("_e")[n].alias(f"n_{n}") for n in names],
        total.alias("n_bad_chars"),
        (total == 0).alias("is_clean"),
    )


def encoding_report(df: DataFrame, text_col: str = "text",
                    by: str | None = "source") -> DataFrame:
    """Corpus-level encoding report, optionally per ``by`` group: docs
    scanned, docs affected per class, total bad chars, clean fraction.
    Partial-aggregated map-side; the shuffle carries |groups| rows."""
    c = encoding_counts(text_col)
    keys = [by] if by else []
    tmp = df.select(*keys, c.alias("_e"))
    names = list(ENCODING_PATTERNS)
    total = sum((F.col("_e")[n] for n in names[1:]), F.col("_e")[names[0]])
    tmp = tmp.select(*keys, "_e", total.alias("_tot"))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for n in names:
        aggs.append(F.sum((F.col("_e")[n] > 0).cast("long"))
                    .alias(f"docs_{n}"))
    aggs.append(F.sum("_tot").alias("total_bad_chars"))
    aggs.append(F.round(F.avg((F.col("_tot") == 0).cast("double")), 6)
                .alias("clean_frac"))
    g = tmp.groupBy(*keys) if keys else tmp.groupBy()
    out = g.agg(*aggs)
    return out.orderBy(*keys) if keys else out
