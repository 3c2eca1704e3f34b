"""Document chunking — split oversized documents into fixed-size
training windows with optional overlap.

This is the pre-step ``pack_greedy`` (operators/packing.py) deliberately
does NOT do: the packer flags ``n_tok > max_tokens`` docs as truncated
single-doc bins and leaves the split/drop decision to the caller.  This
module is the "split" answer — after chunking, every sequence fits the
context window and the packer never truncates.

Sliding-window semantics (the standard LM data-prep shape): window
``W = max_tokens``, stride ``S = W - overlap``; chunk *i* covers tokens
``[i*S, i*S + W)``.  Every token lands in >= 1 chunk (no data loss);
consecutive chunks share exactly ``overlap`` tokens.  The final chunk is
the tail remainder — its length is in ``(overlap, W]`` for multi-chunk
docs, so it is never a near-duplicate of its predecessor.

Distributed design (10^12 docs): pure Catalyst — one ``sequence`` per
row enumerates chunk indices, one generator (explode) fans them out,
``slice`` cuts the window.  ZERO shuffles, zero Python, bounded per-row
state (the index array holds <= ceil(n/S) ints, not token copies).
Chunk ids are pure functions of (doc id, chunk index), so reruns and
resumes produce identical chunks (plans/manifest.py lineage contract).

No counterpart in guyskk/validr (no notion of sequences or windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "chunk_text"]


def _n_chunks(n, window: int, stride: int):
    """Chunk count for a length-``n`` doc: 1 if it fits, else
    ``ceil((n - window) / stride) + 1`` (windows at 0, S, 2S, ... until
    the last window reaches the end)."""
    return (F.when(n <= window, F.lit(1))
            .otherwise(F.floor((n - window + stride - 1) / stride) + 1)
            .cast("int"))


def _check_window(max_len: int, overlap: int) -> int:
    if max_len <= 0:
        raise ValueError(f"max window must be positive, got {max_len}")
    if not 0 <= overlap < max_len:
        raise ValueError(
            f"overlap must be in [0, window), got overlap={overlap} "
            f"window={max_len} (stride would be {max_len - overlap})")
    return max_len - overlap


def chunk_documents(df: DataFrame, max_tokens: int, overlap: int = 0,
                    tokens_col: str = "tokens", id_col: str = "doc_id",
                    chunk_id_col: str = "chunk_id") -> DataFrame:
    """Split token arrays into chunks of <= ``max_tokens`` tokens with
    ``overlap`` tokens shared between consecutive chunks.

    Output: one row per chunk — every input column except ``tokens_col``
    (and any ``n_tok``) carried through, plus ``chunk_index`` (0-based),
    ``n_chunks``, ``tokens_col`` (the window slice), ``n_tok`` (actual
    chunk length, == size(tokens) by construction so the north-rule
    invariant holds), and ``chunk_id_col`` ("<id>#<index>") — feed the
    result to ``pack_greedy(id_col=chunk_id_col)`` for packing without
    truncation.

    NULL / empty token arrays become one chunk with an empty array —
    chunking never drops rows (the validator decides what to do with
    empty sequences, not the splitter).
    """
    stride = _check_window(max_tokens, overlap)
    elem_t = df.schema[tokens_col].dataType
    toks = F.coalesce(F.col(tokens_col), F.array().cast(elem_t))
    carried = [c for c in df.columns if c not in (tokens_col, "n_tok")]
    base = df.select(
        *carried,
        toks.alias("_toks"),
        _n_chunks(F.size(toks), max_tokens, stride).alias("n_chunks"))
    fanned = base.select(
        *carried, "_toks", "n_chunks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1))
        .alias("chunk_index"))
    chunk = F.slice(F.col("_toks"),
                    F.col("chunk_index") * stride + 1, max_tokens)
    return (fanned
            .withColumn(tokens_col, chunk)
            .withColumn("n_tok", F.size(F.col(tokens_col)))
            .withColumn(chunk_id_col,
                        F.concat_ws("#", F.col(id_col).cast("string"),
                                    F.col("chunk_index").cast("string")))
            .drop("_toks"))


def chunk_text(df: DataFrame, max_words: int, overlap: int = 0,
               text_col: str = "text", id_col: str = "doc_id",
               chunk_id_col: str = "chunk_id") -> DataFrame:
    """Word-granularity twin of :func:`chunk_documents` for raw text:
    split on whitespace runs (empty tokens filtered, so leading/multi
    whitespace does not mint ghost words), window the word list, and
    re-join each window with single spaces.

    Output: carried columns + ``chunk_index``, ``n_chunks``,
    ``text_col`` (the chunk, single-space joined — whitespace runs are
    NOT preserved; chunking is a training-prep transform, not a
    reversible encoding), ``n_words``, ``chunk_id_col``.

    Same zero-shuffle generator plan as the token path.
    """
    stride = _check_window(max_words, overlap)
    words = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""))
    carried = [c for c in df.columns if c != text_col]
    base = df.select(
        *carried, words.alias("_words"),
        _n_chunks(F.size(words), max_words, stride).alias("n_chunks"))
    fanned = base.select(
        *carried, "_words", "n_chunks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1))
        .alias("chunk_index"))
    win = F.slice(F.col("_words"),
                  F.col("chunk_index") * stride + 1, max_words)
    return (fanned
            .withColumn("n_words", F.size(win))
            .withColumn(text_col, F.array_join(win, " "))
            .withColumn(chunk_id_col,
                        F.concat_ws("#", F.col(id_col).cast("string"),
                                    F.col("chunk_index").cast("string")))
            .drop("_words"))
