"""Scale-tuned validation pipeline for the tokenized-sequence table
(doc_id, tokens:array<int>, n_tok, source) — the north-star workload.

Why this exists: the generic compiler validates array elements with
Catalyst lambda HOFs (`transform`/`exists`), which evaluate *interpreted*
(CodegenFallback) at ~20 µs/element — 10-30× slower than whole-stage
codegen.  For 10^12 sequences × 10^2..10^4 tokens that is the difference
between hours and weeks.  This module expresses the SAME checks as two
fully-codegen'd passes:

1. **row-level pass** — the compiled plan for the scalar fields plus the
   list *length* rules (``T.list.minlen/maxlen`` without an element schema
   compiles to plain CASE expressions: no HOF anywhere);
2. **token-level pass** — ``posexplode`` → ``filter(bad)`` →
   ``groupBy(id).min(struct(idx, …))``: whole-stage codegen end to end,
   and only the ~violation-rate fraction of tokens reaches the shuffle
   (map-side partial min).

The union reproduces the generic engine's violations EXACTLY (same
rule_id / position / message / value strings, same fail-fast-per-field
choice, including the "element error at index < maxlen beats the maxlen
violation" rule) — asserted by tests/test_sequences_fastpath.py against
``SparkCompiler().compile(schema).apply(df)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler import SparkCompiler
from ..schema import T


def rowlevel_schema(vocab: int, maxlen: int, sources: list[str],
                    max_id_len: int = 64, max_n_tok: int | None = None):
    """The sequence schema MINUS the per-element rule (length rules only —
    compiles to pure CASE expressions, no higher-order functions)."""
    return T.dict(
        doc_id=T.str.minlen(1).maxlen(max_id_len),
        tokens=T.list.minlen(1).maxlen(maxlen),
        n_tok=T.int.min(1).max(max_n_tok if max_n_tok is not None else maxlen),
        source=T.enum(" ".join(sources)),
    )


def token_range_violations(df: DataFrame, id_col: str, vocab: int,
                           maxlen: int,
                           tokens_col: str = "tokens") -> DataFrame:
    """First out-of-range/null token per row, as a violations row with the
    generic engine's exact formatting (rule ids ``tokens[].required/min/
    max``, position ``tokens[i]``).

    Only tokens at index < maxlen are considered: the generic chain lets
    the list's own maxlen violation win for later indices.
    """
    x, i = F.col("_x"), F.col("_i")
    bad = (df.select(F.col(id_col),
                     F.posexplode(tokens_col).alias("_i", "_x"))
           .filter((i < maxlen)
                   & (x.isNull() | (x < 0) | (x >= vocab))))
    first = bad.groupBy(id_col).agg(
        F.min(F.struct(F.col("_i"), F.col("_x"))).alias("_f"))
    fi = F.col("_f._i")
    fx = F.col("_f._x")
    hi = vocab - 1
    return first.select(
        F.col(id_col),
        F.when(fx.isNull(), F.lit("tokens[].required"))
         .when(fx < 0, F.lit("tokens[].min"))
         .otherwise(F.lit("tokens[].max")).alias("rule_id"),
        F.concat(F.lit("tokens["), fi.cast("string"), F.lit("]"))
         .alias("position"),
        F.when(fx.isNull(), F.lit("required"))
         .when(fx < 0, F.lit("value must >= 0"))
         .otherwise(F.lit(f"value must <= {hi}")).alias("message"),
        fx.cast("string").alias("value"),
    )


def sequence_violations(df: DataFrame, *, vocab: int, maxlen: int = 8192,
                        sources: list[str], id_col: str,
                        max_id_len: int = 64,
                        max_n_tok: int | None = None) -> DataFrame:
    """All violations for the sequence schema, two codegen passes, exact
    parity with ``SparkCompiler().compile(full_schema).apply(df)``."""
    plan = SparkCompiler().compile(
        rowlevel_schema(vocab, maxlen, sources, max_id_len, max_n_tok))
    row_v = plan.apply(df, id_cols=[id_col]).violations()
    tok_v = token_range_violations(df, id_col, vocab, maxlen)

    # fail-fast parity: when an element error (idx < maxlen) exists, the
    # generic chain SUPPRESSES the tokens.maxlen violation for that row.
    # Both sides of this anti-join are violation rows (~violation-rate),
    # not data rows.
    row_keep = row_v.filter(F.col("rule_id") != "tokens.maxlen")
    row_maxlen = (row_v.filter(F.col("rule_id") == "tokens.maxlen")
                  .join(tok_v.select(id_col), on=id_col, how="left_anti"))
    return row_keep.unionByName(row_maxlen).unionByName(tok_v)


def build_report_queries(df: DataFrame, dim: DataFrame, *, vocab: int,
                         maxlen: int = 8192, sources: list[str],
                         max_id_len: int = 64,
                         max_n_tok: int | None = None) -> dict:
    """Build (don't run) the three verdict queries; see sequence_report."""
    from .uniqueness import duplication_report

    plan = SparkCompiler().compile(
        rowlevel_schema(vocab, maxlen, sources, max_id_len, max_n_tok))
    dimj = F.broadcast(dim.select("source").withColumn("_in_dim", F.lit(1)))

    # pass 1: row-level checks + verdict dimensions (scan-bound, codegen)
    res = plan.apply(
        df.withColumn("_n_tok_raw", F.col("n_tok"))
          .withColumn("_size_raw", F.size("tokens"))
          .withColumn("_src_raw", F.col("source")),
        id_cols=["_n_tok_raw", "_size_raw", "_src_raw"])
    nviol = F.size("_violations")
    agg1 = (res.df
            .join(dimj, res.df["source"] == dimj["source"], "left")
            .groupBy("_src_raw")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("_size_raw").alias("n_tokens"),
                 F.sum(nviol).alias("n_row_violations"),
                 F.sum(F.when(nviol > 0, 1).otherwise(0)).alias("n_bad_rows"),
                 F.sum(F.when(F.col("_in_dim").isNull(), 1).otherwise(0))
                  .alias("n_orphans"),
                 F.sum(F.when(F.col("_n_tok_raw") != F.col("_size_raw"), 1)
                       .otherwise(0)).alias("n_inconsistent")))

    # pass 2: token-range counts per source (codegen explode pipeline;
    # only bad tokens reach the partial agg).  The source STRING is
    # dictionary-encoded to a tiny int BEFORE the explode — carrying a
    # string per exploded token costs more than the range check itself.
    # -1 = null source, -2 = source not in the configured list.  Known/null
    # sources take the fast branch: ONLY the tiny int rides the explode —
    # carrying a string per exploded token costs more than the range check
    # itself (PERF.md Finding 1; measured 2.8s → 15.8s when a
    # mostly-null string column was added here).  Unknown sources (rare:
    # they're referential violations) take a separate pre-filtered branch
    # that groups by the raw string so their counts are attributed, not
    # silently dropped.
    src_id = F.when(F.col("source").isNull(), F.lit(-1)).otherwise(F.lit(-2))
    for k, s in enumerate(sources):
        src_id = F.when(F.col("source") == s, F.lit(k)).otherwise(src_id)
    x = F.col("_x")
    known = (df.filter(F.col("source").isin(sources)
                       | F.col("source").isNull())
             .select(src_id.alias("_sid"), F.explode("tokens").alias("_x"))
             .filter(x.isNull() | (x < 0) | (x >= vocab))
             .groupBy("_sid")
             .agg(F.count(F.lit(1)).alias("n_token_violations"))
             .select("_sid", F.lit(None).cast("string").alias("_src_unk"),
                     "n_token_violations"))
    unknown = (df.filter(~F.col("source").isin(sources)
                         & F.col("source").isNotNull())
               .select(F.col("source").alias("_src_unk"),
                       F.explode("tokens").alias("_x"))
               .filter(x.isNull() | (x < 0) | (x >= vocab))
               .groupBy("_src_unk")
               .agg(F.count(F.lit(1)).alias("n_token_violations"))
               .select(F.lit(-2).alias("_sid"), "_src_unk",
                       "n_token_violations"))
    agg2 = known.unionByName(unknown)
    return {"agg1": agg1, "agg2": agg2,
            "dup": duplication_report(df, "doc_id"),
            "sources": sources}


def collect_report(queries: dict) -> dict:
    """Execute the three verdict queries (the scan/shuffle work — time
    THIS for throughput numbers; planning is one-time at real scale).

    The three jobs are submitted CONCURRENTLY (Spark's scheduler shares
    executor cores between jobs): driver-side submit/collect latency
    overlaps, and stage tails of one job fill idle cores of another —
    the serial fraction that would otherwise cap N→4N scaling.
    """
    from concurrent.futures import ThreadPoolExecutor

    sources = queries["sources"]
    with ThreadPoolExecutor(max_workers=3) as pool:
        f1 = pool.submit(queries["agg1"].collect)
        f2 = pool.submit(queries["agg2"].collect)
        f3 = pool.submit(queries["dup"].collect)
        agg1_rows, agg2_rows, dup_rows = (f1.result(), f2.result(),
                                          f3.result())
    tokviol = {}
    for r in agg2_rows:
        if r["_sid"] >= 0:
            key = sources[r["_sid"]]
        elif r["_sid"] == -2:          # unknown non-null source: raw string
            key = r["_src_unk"]
        else:                          # -1: null source
            key = None
        tokviol[key] = tokviol.get(key, 0) + r["n_token_violations"]
    per_source = [
        {**r.asDict(),
         "n_token_violations": int(tokviol.get(r["_src_raw"], 0)),
         "source": r["_src_raw"]}
        for r in agg1_rows
    ]
    for row in per_source:
        row.pop("_src_raw", None)
    per_source.sort(key=lambda r: (r["source"] is None, r["source"]))
    dup = dup_rows[0]
    return {"per_source": per_source,
            "dup_keys": int(dup["n_dup_keys"]),
            "n_keys": int(dup["n_keys"])}


def sequence_report(df: DataFrame, dim: DataFrame, **kw) -> dict:
    """One-shot verdict metrics for the bench / manifest pipeline:
    per-source rows, tokens, row-level violations, token violations,
    referential orphans, n_tok consistency — 2 codegen scans + 1
    uniqueness shuffle, no HOF anywhere.

    Returns {"per_source": [...rows...], "dup_keys": int, "n_keys": int}.
    """
    return collect_report(build_report_queries(df, dim, **kw))


def frame_violations(df: DataFrame, *, id_col: str = "doc_id",
                     tokens_col: str = "tokens",
                     bos: int | None = None, eos: int | None = None,
                     pad: int | None = None) -> DataFrame:
    """Token-frame integrity checks for pre-tokenized sequences: BOS/EOS
    placement, trailing-only padding, and non-empty content — the framing
    invariants a tokenizer + packer must leave behind, which plain
    range/length rules (rowlevel_schema / token_range_violations) cannot
    see.

    Checks (each emitted as one violation row, engine formatting —
    ``(id, rule_id, position, message, value)``):

    * ``tokens.bos``  — first token is not ``bos`` (when ``bos`` given);
    * ``tokens.eos``  — last NON-PAD token is not ``eos`` (when ``eos``
      given; with ``pad=None`` the literal last token);
    * ``tokens.pad``  — a pad token occurs before a non-pad token (only
      trailing padding is legal; when ``pad`` given);
    * ``tokens.content`` — no non-pad tokens at all (empty array or
      all-pad).

    Scale shape: one map-side projection per row, with a per-row
    FAST/SLOW split (both pure codegen, no lambda HOF — PERF.md Finding
    1 — no shuffle, no Python):

    * **fast path** (the well-formed majority): pure native array ops —
      ``array_position`` finds the first pad, ``slice`` + ``array_min/
      max`` prove the tail is one clean pad run, ``try_element_at``
      reads the frame tokens.  No string materialization at all.
      Eligible when the row has no null elements AND (no pad occurs, or
      everything from the first pad onward is pad).
    * **slow path** (corrupt rows — interior pads or null elements): the
      token array is rendered ONCE to a comma string, the trailing pad
      run is stripped with a single anchored regex, and the checks read
      that rendering.  Runs only for the ~violation-rate fraction
      (``CASE`` branches evaluate lazily per row in codegen).

    Measured on the 1M-row bench table (local[32], warm, ~128 tok/row):
    the all-string formulation ran 18.9 s (53k seqs/s); this split runs
    4.5–6.5 s (150k–220k seqs/s) on both a pad-free corpus and an
    adversarial interior-pad corpus (PERF.md Finding 11).

    Null ELEMENTS are skipped by the slow path's ``concat_ws`` rendering
    and force the row onto that path — run this alongside
    ``token_range_violations``, which reports them as
    ``tokens[].required``.  Positions are indices in the null-skipped
    rendering (identical to array indices when no element is null).
    Rows with a NULL array are skipped entirely (that is the schema's
    ``required`` rule).
    """
    t = F.col(tokens_col)
    size_t = F.size(t)
    no_nulls = F.size(F.array_compact(t)) == size_t
    # ",t0,t1,...," — outer commas make every token delimiter-bounded so
    # substring probes can't false-match inside multi-digit ids
    s = F.concat(F.lit(","), F.concat_ws(",", t), F.lit(","))
    if pad is not None:
        # one greedy anchored match strips the whole trailing pad run.
        # The run must START at a delimiter — a bare "(?:0,)+$" would eat
        # the tail of a multi-digit token ("100," ends with "0,").  The
        # leading comma is consumed and re-emitted (no lookbehind: the
        # DuckDB oracle twin runs RE2, which has none).
        stripped = F.regexp_replace(s, r",(?:%d,)+$" % pad, ",")
        # fast-path eligibility: first pad onward is ONE clean pad run
        p = F.array_position(t, F.lit(pad))          # 1-based; 0 = absent
        tail = F.slice(t, F.greatest(p, F.lit(1)).cast("int"),
                       F.greatest(size_t - p.cast("int") + 1, F.lit(0)))
        tail_all_pad = ((F.array_min(tail) == pad)
                        & (F.array_max(tail) == pad))
        fast = no_nulls & ((p == 0) | tail_all_pad)
        n_trail_fast = F.when(p == 0, F.lit(0).cast("long")) \
            .otherwise((size_t - p + 1).cast("long"))
        interior_slow = stripped.contains(f",{pad},")
        pad_w = len(str(pad)) + 1
    else:
        stripped = s
        fast = no_nulls
        n_trail_fast = F.lit(0).cast("long")
        interior_slow = F.lit(False)
        pad_w = 1

    # slow-path quantities (string rendering; evaluated per row only on
    # the slow branch — codegen CASE is lazy)
    last_tok_slow = F.regexp_extract(stripped, r",([^,]+),$", 1)
    n_trail_slow = ((F.char_length(s) - F.char_length(stripped))
                    / F.lit(pad_w)).cast("long")
    # k rendered tokens produce k+1 commas in s — except k=0 (all
    # elements null), where s is ",," (2 commas): count that as 0, not
    # 1, so has_content stays false and tokens.content fires instead of
    # spurious bos/eos
    n_visible_slow = F.when(F.char_length(s) <= 2, F.lit(0)) \
        .otherwise(F.regexp_count(s, F.lit(",")) - 1)

    # combined per-row quantities
    content_n = F.when(fast, size_t.cast("long") - n_trail_fast) \
        .otherwise(n_visible_slow.cast("long") - n_trail_slow)
    has_content = content_n > 0
    last_tok = F.when(fast, F.try_element_at(
        t, content_n.cast("int")).cast("string")).otherwise(last_tok_slow)
    last_idx = content_n - 1
    interior = F.when(fast, F.lit(False)).otherwise(interior_slow)
    # try_element_at: plain element_at throws under ANSI on empty arrays
    first_tok = F.try_element_at(t, F.lit(1))

    def viol(rule, position, message, value):
        return F.struct(F.lit(rule).alias("rule_id"),
                        position.cast("string").alias("position"),
                        F.lit(message).alias("message"),
                        value.cast("string").alias("value"))

    checks = []
    if bos is not None:
        # gated on content: an empty/all-pad row reports tokens.content
        # alone, not three cascading framing errors
        checks.append(F.when(
            has_content & ((first_tok != bos) | first_tok.isNull()),
            viol("tokens.bos", F.lit(f"{tokens_col}[0]"),
                 f"first token must be {bos}", first_tok)))
    if eos is not None:
        checks.append(F.when(
            has_content & (last_tok != F.lit(str(eos))),
            viol("tokens.eos",
                 F.concat(F.lit(f"{tokens_col}["), last_idx.cast("string"),
                          F.lit("]")),
                 f"last non-pad token must be {eos}", last_tok)))
    if pad is not None:
        checks.append(F.when(
            interior,
            viol("tokens.pad", F.lit(tokens_col),
                 "pad tokens must be trailing only", F.lit(pad))))
    checks.append(F.when(
        ~has_content,
        viol("tokens.content", F.lit(tokens_col),
             "sequence has no content tokens", F.size(t))))

    vs = F.array_compact(F.array(*checks))
    return (df.filter(t.isNotNull())
            .select(F.col(id_col), vs.alias("_v"))
            .filter(F.size("_v") > 0)
            .select(id_col, F.explode("_v").alias("_e"))
            .select(id_col, "_e.rule_id", "_e.position", "_e.message",
                    "_e.value"))


def position_token_stats(df: DataFrame, tokens_col: str = "tokens",
                         max_pos: int = 64) -> DataFrame:
    """Per-POSITION token distribution over the sequence corpus: for each
    of the first ``max_pos`` positions — sequences covering it, distinct
    tokens, top token + its share, and Shannon entropy (bits).

    The template detector for pre-tokenized data: a corpus whose first
    40 positions have entropy ≈ 0 (every sequence opens with the same
    boilerplate header) wastes context window and skews loss; a
    position whose top-token share suddenly jumps mid-corpus marks
    injected template data.  Normal text shows high entropy at every
    position after BOS.

    Shape at scale: ``slice`` BEFORE ``posexplode`` bounds the explode
    at ``max_pos`` rows per sequence regardless of sequence length; two
    chained hash-aggs ((pos, token) then pos — map-side partials, the
    shuffle carries distinct (pos, token) pairs ≤ max_pos·vocab); the
    per-position top token rides the same aggregate via ``max_by``.
    All codegen, no lambda HOFs, no Python.
    """
    pre = (df.filter(F.col(tokens_col).isNotNull())
           .select(F.posexplode(F.slice(tokens_col, 1, max_pos))
                   .alias("pos", "token")))
    per_tok = (pre.groupBy("pos", "token")
               .agg(F.count(F.lit(1)).alias("c")))
    cnt = F.col("c").cast("double")
    n = F.sum("c").cast("double")
    return (per_tok.groupBy("pos")
            .agg(F.sum("c").alias("n_seqs"),
                 F.count(F.lit(1)).alias("n_distinct_tokens"),
                 F.max_by("token", F.struct(F.col("c"), -F.col("token")))
                 .alias("top_token"),
                 F.round(F.max("c") / F.sum("c"), 6).alias("top_share"),
                 F.round(F.log2(n) - F.sum(cnt * F.log2(cnt)) / n, 6)
                 .alias("entropy"))
            .orderBy("pos"))


def token_ngram_stats(df: DataFrame, tokens_col: str = "tokens",
                      id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Per-SEQUENCE token n-gram repetition profile — the degenerate-
    generation detector for pre-tokenized corpora: a sequence that loops
    ("the the the …" or a repeated phrase) shows a high duplicate-n-gram
    fraction / top-n-gram share long before a human reads it.  The
    token-array twin of the text-side ``repetition_features`` /
    ``top_ngram_stats`` (operators/textstats.py), for tables that ship
    only the north-rule sequence shape (tokens, no raw text) — exactly
    the synthetic-data QC gate a generation pipeline needs.

    Columns per sequence with ≥ ``n`` tokens (shorter sequences carry no
    n-gram signal and are absent — left-join from the corpus if you need
    them as NULL rows): ``(id, n_ngrams, n_distinct, dup_ngram_frac,
    top_ngram_share, loop_frac)`` where ``dup_ngram_frac`` is
    ``1 − n_distinct/n_ngrams``, ``top_ngram_share`` is the most frequent
    n-gram's share, and ``loop_frac`` is the share of n-grams whose
    tokens are ALL identical (the single-token loop; trivially 1.0 when
    ``n == 1``).

    Shape at scale: ``slice``+``arrays_zip`` n-gram construction (pure
    codegen — no lambda HOFs, PERF.md Finding 1; same idiom as
    operators/spans.positioned_ngrams) → explode → two chained hash
    aggregates ((id, gram) then id) with map-side partials; the shuffle
    carries distinct (id, gram) int structs, never text.  Zero Python.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    sz = F.size(F.col(tokens_col))
    m = sz - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(tokens_col, i + 1, m) for i in range(n)])
    pre = (df.filter(F.col(tokens_col).isNotNull() & (sz >= n))
           .select(F.col(id_col), F.explode(zipped).alias("_g")))
    gf = [F.col("_g")[str(i)] for i in range(n)]
    allsame = F.lit(True)
    for g in gf[1:]:
        allsame = allsame & g.eqNullSafe(gf[0])
    per = (pre.groupBy(id_col, "_g")
           .agg(F.count(F.lit(1)).alias("_c"),
                # function of the group key — max() just carries it
                F.max(allsame.cast("int")).alias("_eq")))
    tot = F.sum("_c").cast("double")
    return (per.groupBy(id_col)
            .agg(F.sum("_c").alias("n_ngrams"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.round(F.lit(1.0) - F.count(F.lit(1)) / tot, 6)
                 .alias("dup_ngram_frac"),
                 F.round(F.max("_c") / tot, 6).alias("top_ngram_share"),
                 F.round(F.sum(F.col("_c") * F.col("_eq")) / tot, 6)
                 .alias("loop_frac")))
