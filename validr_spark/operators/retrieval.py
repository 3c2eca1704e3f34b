"""BM25 text retrieval — the keyword-search baseline next to the
embedding ANN operators (operators/similarity.py): score documents
against one or many queries with Okapi BM25 (Lucene idf form) and take
the per-query top-k.

Pipeline uses: nearest-neighbor lookup for benchmark decontamination
sweeps, corpus QA ("what does the corpus say about X"), and a lexical
recall baseline when judging embedding retrieval quality.

Distributed design (10^12 docs):

* Queries are SMALL by contract (a query table, not a second corpus) —
  their distinct terms are collected to the driver once and pushed into
  the corpus scan as an ``isin`` (InSet) filter, so the posexplode
  pipeline drops every non-matching word map-side.  Nothing row-shaped
  crosses the network except (doc, term) HITS.
* tf per (doc, term) and df per term come from the same hash
  aggregate.  Catalyst's ReuseExchange does NOT dedupe it on its own —
  column pruning strips ``first(_dl)`` from the df branch, the two
  subplans stop being canonically equal, and the corpus gets scanned
  twice (measured).  So the HITS relation (small by contract: only
  query-term rows survive the map-side InSet filter) is persisted, and
  both consumers read the cache — one corpus scan for scoring
  (asserted in tests/test_retrieval.py).  Pass ``cache_hits=False``
  for a fully-lazy plan at the cost of that extra scan.
* Corpus stats (N, avgdl) are one separate scan-bound aggregate joined
  in as a broadcast single row — two corpus scans total, zero Python.
* Per-query top-k is a rank window over hits only; Spark pushes a
  WindowGroupLimit partial top-k into each map task.

Scoring: BM25(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — Lucene's
non-negative variant.  Repeated terms in a query count once
(query-side tf is not used, matching Lucene's default).

No counterpart in guyskk/validr (no retrieval surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["bag_of_words", "bm25_scores", "bm25_join", "bm25_topk"]


def bag_of_words(col):
    """Lowercase alphanumeric tokenizer shared by the doc and query
    sides (parity is required — a term tokenized differently on the two
    sides can never match)."""
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), "[^a-z0-9]+"),
        lambda x: x != F.lit(""))


def bm25_scores(df: DataFrame, queries: DataFrame, *,
                k1: float = 1.2, b: float = 0.75,
                cache_hits: bool = True,
                text_col: str = "text", id_col: str = "doc_id",
                query_id_col: str = "query_id",
                query_text_col: str = "query") -> DataFrame:
    """BM25 score for every (query, doc) pair sharing >= 1 term:
    (query_id, doc id, score).  Docs with no query term are absent
    (score 0 by definition).

    ``cache_hits=True`` persists the (doc, term) hit relation so the tf
    and df aggregates share one corpus scan; the cache entry lives until
    the caller clears it (``spark.catalog.clearCache()``)."""
    words = bag_of_words(F.col(text_col))
    docs = (df.select(F.col(id_col), words.alias("_w"))
            .withColumn("_dl", F.size("_w")))
    corpus = docs.agg(F.count(F.lit(1)).alias("_n_docs"),
                      F.avg("_dl").alias("_avgdl"))
    qterms = (queries.select(
                  F.col(query_id_col),
                  F.explode(bag_of_words(F.col(query_text_col)))
                  .alias("_term"))
              .distinct())
    # queries are small by contract: one driver round-trip builds the
    # map-side InSet pushdown for the corpus scan
    all_terms = [r["_term"] for r in
                 qterms.select("_term").distinct().collect()]
    if not all_terms:
        return (qterms.select(query_id_col)
                .withColumn(id_col, F.lit(None).cast(
                    df.schema[id_col].dataType))
                .withColumn("score", F.lit(None).cast("double"))
                .limit(0))
    pairs = (docs.select(id_col, "_dl", F.explode("_w").alias("_term"))
             .filter(F.col("_term").isin(all_terms))
             .groupBy(id_col, "_term")
             .agg(F.count(F.lit(1)).alias("_tf"),
                  F.first("_dl").alias("_dl")))
    if cache_hits:
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    term_df = pairs.groupBy("_term").agg(
        F.count(F.lit(1)).alias("_df"))
    idf = F.log(F.lit(1.0) + (F.col("_n_docs") - F.col("_df") + 0.5)
                / (F.col("_df") + 0.5))
    tf_part = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl")))
    return (pairs
            .join(F.broadcast(term_df), "_term")
            .join(F.broadcast(qterms), "_term")
            .crossJoin(F.broadcast(corpus))
            .withColumn("_s", idf * tf_part)
            .groupBy(query_id_col, id_col)
            .agg(F.sum("_s").alias("score")))


def bm25_join(df: DataFrame, queries: DataFrame, k: int = 10, *,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              query_id_col: str = "query_id",
              query_text_col: str = "query") -> DataFrame:
    """Per-query BM25 top-k: (query_id, doc id, score, rank) with
    rank 1..k, score-desc, doc-id tie-break (deterministic across
    reruns and engines)."""
    scored = bm25_scores(df, queries, k1=k1, b=b, text_col=text_col,
                         id_col=id_col, query_id_col=query_id_col,
                         query_text_col=query_text_col)
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.desc("score"), F.col(id_col)))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def bm25_topk(df: DataFrame, query: str, k: int = 10, *,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Single-query convenience wrapper: (doc id, score, rank)."""
    queries = df.sparkSession.createDataFrame(
        [(0, query)], "query_id int, query string")
    return (bm25_join(df, queries, k, k1=k1, b=b, text_col=text_col,
                      id_col=id_col)
            .drop("query_id"))
