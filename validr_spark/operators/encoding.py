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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ENCODING_PATTERNS", "encoding_counts", "encoding_scan",
           "encoding_report", "is_nfc", "nfc_normalize_text", "nfc_audit",
           "clean_text"]

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


# --- Unicode normalization-form hygiene -------------------------------------

_ASCII_ONLY = r"\A[\x00-\x7F]*\z"


def is_nfc(col: Column | str) -> Column:
    """Boolean column: is the string in Unicode NFC (composed) form?

    Mixed-normalization corpora make identical-looking strings tokenize
    differently (``é`` as U+00E9 vs ``e``+U+0301), splitting dedup
    fingerprints, enum/equality checks, and token statistics.

    Catalyst has no normalization-form primitive, so this is an
    Arrow-batched pandas UDF over ``unicodedata.is_normalized`` (a C
    quick-check; batch-vectorized, never per-row Python dispatch).
    NULL in → NULL out.

    Scale note (PERF.md Finding 13): wrapping the UDF in an ASCII
    ``when`` screen does NOT avoid the Python round-trip — Spark
    extracts Python UDFs out of conditionals and evaluates them on
    EVERY row (measured: identical wall time with and without the
    screen).  To genuinely keep a mostly-ASCII corpus out of the Arrow
    channel, FILTER non-ASCII rows first — :func:`nfc_audit` and
    :func:`nfc_normalize_text` do exactly that.
    """
    col = F.col(col) if isinstance(col, str) else col
    return _is_nfc_udf()(col)


# pandas UDFs built lazily (the decorator needs an active SparkContext
# to resolve the return type — same pattern as dedup.simhash)
def _is_nfc_udf():
    @F.pandas_udf("boolean")
    def f(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.is_normalized("NFC", x))
    return f


def _nfc_udf():
    @F.pandas_udf("string")
    def f(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))
    return f


def nfc_normalize_text(df: DataFrame, text_col: str = "text",
                       prefilter: bool = True) -> DataFrame:
    """Rewrite ``text_col`` into NFC.

    ``prefilter=True`` (default, the mostly-ASCII-corpus path): split the
    scan — ASCII/NULL rows pass through entirely JVM-side, only the
    non-ASCII minority is Arrow-shipped to the ``unicodedata.normalize``
    UDF, then the two branches union.  This reads the source twice, but
    two codegen scans (with pushdown) are far cheaper than one Arrow
    round-trip of 100 TB of text; a ``when``-guarded single pass would
    NOT help — Spark evaluates extracted Python UDFs on every row
    (PERF.md Finding 13).  ``prefilter=False`` gives the single-scan
    shape for already-materialized (cached) inputs.  Map-side only, no
    shuffle; the union preserves no order (none is promised).
    """
    c = F.col(text_col)
    if not prefilter:
        fixed = (F.when(c.isNull() | c.rlike(_ASCII_ONLY), c)
                 .otherwise(_nfc_udf()(c)))
        return df.withColumn(text_col, fixed)
    ascii_rows = df.filter(c.isNull() | c.rlike(_ASCII_ONLY))
    rest = (df.filter(c.isNotNull() & ~c.rlike(_ASCII_ONLY))
            .withColumn(text_col, _nfc_udf()(c)))
    return ascii_rows.unionByName(rest)


def nfc_audit(df: DataFrame, text_col: str = "text",
              by: str | None = "source") -> DataFrame:
    """Corpus normalization-form report, optionally per ``by`` group:
    docs scanned, non-ASCII docs, docs not in NFC, non-NFC fraction.

    Two aggregates that join on the group key: corpus-wide counts come
    from a pure-codegen scan; the NFC check runs only on rows FILTERED
    to non-ASCII first (ASCII is NFC by definition), so the Arrow
    channel carries the non-ASCII minority, not the corpus — the filter,
    unlike a ``when`` screen, truly bounds what reaches Python (PERF.md
    Finding 13).  Both shuffles carry |groups| rows.
    """
    c = F.col(text_col)
    keys = [by] if by else []
    base = df.select(
        *keys,
        c.isNotNull().cast("long").alias("_n"),
        (c.isNotNull() & ~c.rlike(_ASCII_ONLY)).cast("long").alias("_na"))
    g = base.groupBy(*keys) if keys else base.groupBy()
    totals = g.agg(F.sum("_n").alias("n_docs"),
                   F.sum("_na").alias("n_non_ascii"))
    nonascii = df.filter(c.isNotNull() & ~c.rlike(_ASCII_ONLY)).select(
        *keys,
        F.when(_is_nfc_udf()(c) == False, 1)  # noqa: E712
        .otherwise(0).alias("_bad"))
    gb = nonascii.groupBy(*keys) if keys else nonascii.groupBy()
    bad = gb.agg(F.sum("_bad").alias("n_not_nfc"))
    joined = (totals.join(bad, keys, "left") if keys
              else totals.crossJoin(bad))
    out = joined.select(
        *keys, "n_docs", "n_non_ascii",
        F.coalesce("n_not_nfc", F.lit(0)).alias("n_not_nfc"),
        F.round(F.try_divide(F.coalesce("n_not_nfc", F.lit(0)), "n_docs"),
                6).alias("not_nfc_frac"))
    return out.orderBy(*keys) if keys else out


def clean_text(df: DataFrame, text_col: str = "text",
               strip_controls: bool = True, strip_zero_width: bool = True,
               collapse_whitespace: bool = True,
               nfc: bool = True) -> DataFrame:
    """The repair counterpart of :func:`encoding_scan`: apply the SAFE
    subset of fixes in one pass — strip C0 controls/DEL, strip
    zero-width chars (ZWSP/ZWNJ/ZWJ/in-body BOM), collapse whitespace
    runs (preserving single newlines as line structure), and NFC-
    normalize.  Mojibake and U+FFFD are deliberately NOT "fixed": the
    original bytes are unrecoverable, so those rows belong in the
    quarantine path (``encoding_scan``'s ``is_clean`` filter), not under
    a silent rewrite.

    Order matters and is fixed: controls/zero-width out first (so a
    control char between two spaces collapses to ONE space), whitespace
    second, NFC last.  Idempotent: cleaning cleaned text is a no-op
    (asserted in tests).  Everything except the NFC step is codegen
    `regexp_replace`; NFC routes only the non-ASCII minority through
    Arrow (:func:`nfc_normalize_text` plan-structure gating).
    """
    c = F.col(text_col)
    if strip_controls:
        c = F.regexp_replace(
            c, r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}"
               r"\x{007F}]", "")
    if strip_zero_width:
        c = F.regexp_replace(c, r"[\x{200B}-\x{200D}\x{FEFF}]", "")
    if collapse_whitespace:
        # runs containing a newline become one newline (keep paragraph/
        # line structure); pure horizontal runs become one space; then
        # trim the ends
        c = F.regexp_replace(c, r"[ \t\r]*\n[ \t\r\n]*", "\n")
        c = F.regexp_replace(c, r"[ \t\r]+", " ")
        c = F.trim(c)
    out = df.withColumn(text_col, c)
    if nfc:
        out = nfc_normalize_text(out, text_col)
    return out
