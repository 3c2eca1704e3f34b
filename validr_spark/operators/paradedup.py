"""Paragraph/line-level corpus dedup (C4-style).

C4's cleaning removes text spans that occur verbatim elsewhere in the
corpus (Raffel et al. 2020 §2.2 dedups three-sentence spans; many
pipelines do it per line/paragraph).  This operator drops every repeated
line except its FIRST global occurrence — deterministic: the survivor is
the minimum (doc_id, line position) — and reassembles documents in
original line order.

Scale shape (two shuffles, both on bounded keys):
  1. explode lines → shuffle on the line-content hash; a window
     ``row_number over (partition by line_hash order by doc, pos)``
     marks survivors.  Hot keys (the empty line, boilerplate) are
     bounded: ``min_chars`` exempts short lines map-side BEFORE the
     shuffle, so the pathological hottest keys never enter it.
  2. groupBy doc to reassemble — ``collect_list(struct(pos, line))``
     state is bounded by lines-per-document (a per-row quantity, not a
     corpus quantity), then ``array_sort`` + join.

No counterpart in guyskk/validr (single-value validation only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dedup_paragraphs", "paragraph_stats"]


def _lines(text_col):
    return F.split(F.col(text_col), "\n")


def _exploded(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (df.select(F.col(id_col).alias("_doc"),
                      F.posexplode(_lines(text_col))
                      .alias("_pos", "_line")))


def dedup_paragraphs(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     min_chars: int = 10) -> DataFrame:
    """Rebuild each document with corpus-duplicate lines removed (first
    global occurrence survives; ties broken by (doc_id, position)).

    Lines shorter than ``min_chars`` (after trim) are always kept — they
    are both unlikely boilerplate and exactly the hot keys (blank lines!)
    that would skew the shuffle.  Returns
    (id, text, n_lines, n_removed)."""
    ex = _exploded(df, text_col, id_col)
    short = F.char_length(F.trim(F.col("_line"))) < min_chars
    exempt = ex.filter(short)
    candidate = ex.filter(~short)
    w = Window.partitionBy(F.xxhash64(F.trim(F.col("_line")))) \
        .orderBy("_doc", "_pos")
    survivors = (candidate
                 .withColumn("_rk", F.row_number().over(w))
                 .filter(F.col("_rk") == 1).drop("_rk"))
    kept = exempt.unionByName(survivors)
    rebuilt = (kept.groupBy("_doc")
               .agg(F.array_sort(F.collect_list(
                   F.struct("_pos", "_line"))).alias("_ls"),
                   F.count(F.lit(1)).alias("n_lines")))
    # total line count per doc comes from the source row, not a second
    # pass over the exploded data
    totals = df.select(F.col(id_col).alias("_doc"),
                       F.size(_lines(text_col)).alias("_n_total"))
    # LEFT from totals: a doc whose every line was a duplicate still
    # appears, with empty text (0 lines kept)
    return (totals.join(rebuilt, "_doc", "left")
            .select(F.col("_doc").alias(id_col),
                    F.coalesce(F.concat_ws("\n", F.col("_ls._line")),
                               F.lit("")).alias(text_col),
                    F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
                    (F.col("_n_total")
                     - F.coalesce(F.col("n_lines"), F.lit(0)))
                    .alias("n_removed")))


def paragraph_stats(df: DataFrame, text_col: str = "text",
                    min_chars: int = 10, top_k: int = 20) -> DataFrame:
    """Most-duplicated lines across the corpus (boilerplate detector):
    (line, n_occurrences, n_docs) top-k by occurrences.  Explode →
    partial-agg hash groupBy → TakeOrderedAndProject."""
    ex = (df.select(F.explode(_lines(text_col)).alias("_line"),
                    F.col(df.columns[0]).alias("_doc"))
          .withColumn("_line", F.trim("_line"))
          .filter(F.char_length("_line") >= min_chars))
    return (ex.groupBy("_line")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct("_doc").alias("n_docs"))
            .filter(F.col("n_occurrences") > 1)
            .orderBy(F.desc("n_occurrences"), "_line")
            .limit(top_k)
            .withColumnRenamed("_line", "line"))
