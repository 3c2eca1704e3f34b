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

__all__ = ["PIECE_REGEX", "bpe_pieces", "hash_tokens",
           "tokenize_documents", "build_vocab", "tokenize_with_vocab",
           "vocab_coverage"]

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


def build_vocab(df: DataFrame, text_col: str = "text",
                top_v: int = 32_000,
                specials: list[str] = ("<pad>", "<bos>", "<eos>", "<unk>")
                ) -> DataFrame:
    """Learned frequency-ranked vocabulary over the corpus's BPE-ish
    pieces: (piece, token_id, count, cum_coverage) — ids 0..len(specials)-1
    are the special tokens, then pieces by descending count (ties break
    lexicographically, so the id assignment is deterministic and
    rerun-identical).  ``cum_coverage`` is the running fraction of all
    piece OCCURRENCES covered through this id — read the coverage curve
    to size ``top_v`` (e.g. "32k ids cover 99.2%; OOV rate 0.8%").

    The training-free :func:`hash_tokens` path needs no vocab but eats
    1/vocab collisions; this is the learned alternative when a real id
    table is wanted.  Scale shape: explode → hash-agg on pieces (shuffle
    ≤ distinct pieces), then ONE top_v-sized sort on the count table —
    never the corpus; the cumulative window runs over the top_v rows
    only.  The result is vocab-sized: broadcast it (`tokenize_with_vocab`
    does).
    """
    from pyspark.sql import Window
    counts = (df.select(F.explode(bpe_pieces(F.col(text_col)))
                        .alias("piece"))
              .groupBy("piece").agg(F.count(F.lit(1)).alias("count")))
    total = counts.agg(F.sum("count").alias("_t"))
    top = (counts.orderBy(F.desc("count"), "piece").limit(top_v)
           .crossJoin(F.broadcast(total)))
    w = (Window.orderBy(F.desc("count"), "piece")
         .rowsBetween(Window.unboundedPreceding, 0))
    n_special = len(specials)
    ranked = top.select(
        "piece",
        (F.row_number().over(Window.orderBy(F.desc("count"), "piece"))
         + n_special - 1).cast("int").alias("token_id"),
        "count",
        F.round(F.sum("count").over(w) / F.col("_t"), 6)
        .alias("cum_coverage"))
    spec_rows = [(s, i) for i, s in enumerate(specials)]
    spec = ranked.sparkSession.createDataFrame(
        spec_rows, "piece string, token_id int").select(
        "piece", "token_id", F.lit(None).cast("long").alias("count"),
        F.lit(None).cast("double").alias("cum_coverage"))
    return spec.unionByName(ranked).orderBy("token_id")


def tokenize_with_vocab(df: DataFrame, vocab_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        source_col: str | None = "source",
                        unk: str = "<unk>") -> DataFrame:
    """documents → sequence rows using a LEARNED vocabulary (from
    :func:`build_vocab` or any (piece, token_id) table): out-of-vocab
    pieces map to the ``unk`` id.

    Shape at scale: posexplode the pieces, BROADCAST-join the vocab
    (vocab-sized by construction — never a corpus shuffle), then ONE
    groupBy(doc) re-assembles the ordered array via
    ``array_agg(struct(pos, id))`` + ``array_sort`` — the single
    unavoidable shuffle, carrying one (pos, id) pair per piece.  The
    window-free sort happens inside the agg's array, not as a global
    sort.  ``n_tok == size(tokens)`` by construction, like
    :func:`tokenize_documents`.
    """
    unk_row = vocab_df.filter(F.col("piece") == unk).select("token_id")
    unk_ids = [r["token_id"] for r in unk_row.collect()]
    if not unk_ids:
        raise ValueError(f"vocab has no {unk!r} entry")
    unk_id = unk_ids[0]
    cols = [F.col(id_col).cast("string").alias("doc_id"),
            bpe_pieces(F.col(text_col)).alias("_p")]
    if source_col is not None:
        cols.append(F.col(source_col).cast("string").alias("source"))
    pre = df.select(*cols)
    keys = ["doc_id"] + (["source"] if source_col is not None else [])
    # posexplode_outer keeps piece-less docs as one null-piece row, so an
    # empty document still yields (doc, [], 0) instead of vanishing; the
    # when-guard turns that row into a null struct, which collect_list
    # skips — no phantom <unk> token
    exploded = pre.select(*keys,
                          F.posexplode_outer("_p").alias("_pos", "piece"))
    joined = exploded.join(
        F.broadcast(vocab_df.select("piece", "token_id")), "piece", "left")
    tok = F.coalesce("token_id", F.lit(unk_id)).cast("int")
    assembled = (joined.groupBy(*keys)
                 .agg(F.array_sort(F.collect_list(
                     F.when(F.col("_pos").isNotNull(),
                            F.struct(F.col("_pos"), tok.alias("_id")))))
                      .alias("_sorted")))
    # strip positions with a shallow transform (one field access/element)
    toks = F.transform(F.col("_sorted"), lambda s: s["_id"])
    out = assembled.select(
        "doc_id",
        F.when(F.monotonically_increasing_id() >= 0, toks).alias("tokens"),
        *(["source"] if source_col is not None else []))
    return out.select("doc_id", "tokens",
                      F.size("tokens").alias("n_tok"),
                      *(["source"] if source_col is not None else []))


def vocab_coverage(df: DataFrame, vocab_df: DataFrame,
                   text_col: str = "text",
                   by: str | None = "source") -> DataFrame:
    """OOV report for a vocabulary against a corpus, optionally per
    ``by`` group: total piece occurrences, OOV occurrences, OOV rate —
    the acceptance test before committing to a vocab ("32k ids leave
    0.8% OOV on web but 9% on code" means the code slice needs its own
    merges).  Works with :func:`build_vocab` output or any table with a
    ``piece`` column.

    Shape at scale: explode pieces → BROADCAST left-anti-style join
    against the vocab (vocab-sized by construction) → per-group counts;
    the shuffle carries |groups| rows, pieces never shuffle.
    """
    keys = [by] if by else []
    pieces = (df.filter(F.col(text_col).isNotNull())
              .select(*keys, F.explode(bpe_pieces(F.col(text_col)))
                      .alias("piece")))
    known = (vocab_df.select("piece").dropDuplicates(["piece"])
             .withColumn("_known", F.lit(1)))
    marked = pieces.join(F.broadcast(known), "piece", "left")
    g = marked.groupBy(*keys) if keys else marked.groupBy()
    out = g.agg(
        F.count(F.lit(1)).alias("n_pieces"),
        F.sum(F.col("_known").isNull().cast("long")).alias("n_oov"),
        F.round(F.try_divide(F.sum(F.col("_known").isNull().cast("long")),
                             F.count(F.lit(1))), 6).alias("oov_rate"))
    return out.orderBy(*keys) if keys else out
