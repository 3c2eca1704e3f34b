"""Hash-vocabulary tokenization: free text → the tokenized-sequence shape.

Bridges the ``documents`` table to the north-rule sequence table
(``doc_id:string, tokens:array<int>, n_tok:int, source:string``) so the
whole validation/dedup/packing stack downstream of tokenization can be
exercised end-to-end: segment text into BPE-ish pieces with one regex
pass, then map each piece to a stable id in ``[0, vocab)`` by hashing
(feature-hashing vocabulary — deterministic, training-free, collision
rate 1/vocab; a real BPE merges table would slot in behind the same
signature).

Scale shape: everything is a map-side projection over the scan — zero
shuffle.  Piece segmentation is one codegen ``regexp_extract_all``.  The
per-piece hash is a single shallow ``transform`` lambda (one
xxhash64+pmod per element): a lambda HOF evaluates interpreted
(PERF.md Finding 1), but the explode→groupBy alternative that fixed
minhash does NOT help here — re-assembling the ordered token array
would need a collect_list shuffle plus an interpreted struct-strip
``transform`` anyway, strictly worse than the one shallow lambda.

No counterpart in guyskk/validr (the reference validates already-
tokenized values; it never tokenizes).  The piece regex is shared with
textstats.bpe_ish_token_count so ``n_tok`` agrees with the counting
path by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PIECE_REGEX", "bpe_pieces", "hash_tokens", "tokenize_documents"]

# same alternation as textstats.bpe_ish_token_count: short letter runs,
# single digits, standalone punctuation (Java ∩ RE2 dialect — the DuckDB
# oracle runs the identical pattern)
PIECE_REGEX = r"[A-Za-z]{1,4}|\d|[^\w\s]"


def bpe_pieces(col) -> Column:
    """array<string> of BPE-ish pieces — one codegen regex pass."""
    return F.regexp_extract_all(col, F.lit(PIECE_REGEX), 0)


def hash_tokens(col, vocab: int = 50_257, seed: int = 42) -> Column:
    """array<int> of hashed-vocabulary token ids in ``[0, vocab)``."""
    return F.transform(
        bpe_pieces(col),
        lambda p: F.pmod(F.xxhash64(p, F.lit(seed)),
                         F.lit(vocab)).cast("int"))


def tokenize_documents(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       source_col: str | None = "source",
                       vocab: int = 50_257, seed: int = 42) -> DataFrame:
    """documents → sequence-table rows
    (doc_id string, tokens array<int>, n_tok int, source string).

    ``n_tok`` is ``size(tokens)`` by construction, so the downstream
    consistency invariant (operators/consistency.py) holds on the output;
    token ids are in ``[0, vocab)``, so ``T.list(T.int.min(0).
    max(vocab-1))`` validates clean — both asserted in tests.
    """
    # nondeterministic-guarded barrier (same pattern as textstats):
    # without it CollapseProject inlines the transform into size() and the
    # per-element hashing runs twice per row (PERF.md Finding 4)
    toks_once = F.when(F.monotonically_increasing_id() >= 0,
                       hash_tokens(F.col(text_col), vocab, seed))
    cols = [F.col(id_col).cast("string").alias("doc_id"),
            toks_once.alias("tokens")]
    if source_col is not None:
        cols.append(F.col(source_col).cast("string").alias("source"))
    pre = df.select(*cols)
    keep = ["doc_id", "tokens", F.size("tokens").alias("n_tok")] + \
        (["source"] if source_col is not None else [])
    return pre.select(*keep)
