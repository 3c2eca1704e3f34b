"""Driver contract for the spark-graft builder (PySpark target).

Spark side uses validr_spark engine operators; oracle side is hand-matched
ANSI SQL for DuckDB over the same parquet tables.  Column names/types are
aligned pairwise; float aggregates are rounded (or decimal-cast) on BOTH
sides so order-of-summation differences can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from validr_spark import T
from validr_spark.compiler import SparkCompiler
from validr_spark.operators import dedup, drift, similarity, textstats
from validr_spark.operators.referential import orphan_count
from validr_spark.operators.uniqueness import duplication_report

# ---------------------------------------------------------------------------
# shared schema bits
# ---------------------------------------------------------------------------

DOC_LANGS = ["en", "de", "fr", "es"]              # 'zh' intentionally excluded
DOC_SOURCES = [f"src{i}" for i in range(18)]      # src18/src19 excluded

def _enum_expects(items: list[str]) -> str:
    vals = sorted(set(items), key=lambda x: (str(type(x)), str(x)))
    return "{" + ", ".join(repr(v) for v in vals) + "}"


def documents_schema():
    """Validation schema for the documents table (FIXTURES.md §D)."""
    return T.dict(
        doc_id=T.int.min(0),
        text=T.str.minlen(100).maxlen(2000),
        lang=T.enum(DOC_LANGS),
        source=T.enum(DOC_SOURCES),
        n_chars=T.int.min(50).max(400),
    )


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry: flagship — full schema validation of documents → violations table
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compile the documents schema to Catalyst expressions, run
    the one-projection validation pass, return the violations DataFrame."""
    df = _load(spark, "/root/testdata/sf0.001", "documents")
    plan = SparkCompiler().compile(documents_schema())
    return plan.apply(df, id_cols=["doc_id"]).violations()


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def q_doc_null_rate(spark, sf):
    df = _load(spark, sf, "documents")
    nulls = (F.col("text").isNull() | (F.col("text") == "")).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(nulls).alias("n_nulls"),
        F.round(F.sum(nulls) / F.count(F.lit(1)), 6).alias("null_rate"),
    )


def q_doc_length_stats(spark, sf):
    df = _load(spark, sf, "documents")
    return (df.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"))
            .orderBy("lang"))


def q_unique_doc_id(spark, sf):
    return duplication_report(_load(spark, sf, "documents"), "doc_id")


def q_ref_orphans(spark, sf):
    return orphan_count(_load(spark, sf, "orders"),
                        _load(spark, sf, "customer")
                        .withColumnRenamed("c_custkey", "o_custkey"),
                        on="o_custkey")


def lineitem_schema():
    return T.dict(
        l_quantity=T.float.min(1).max(45),
        l_discount=T.float.min(0).max(0.08),
        l_tax=T.float.min(0).max(0.06),
        l_extendedprice=T.float.exmin(0),
    )


def q_lineitem_violations(spark, sf):
    df = _load(spark, sf, "lineitem")
    plan = SparkCompiler().compile(lineitem_schema())
    return plan.apply(df).violations().groupBy("rule_id").agg(
        F.count(F.lit(1)).alias("n_violations")).orderBy("rule_id")


def _validate_documents_viol(spark, sf):
    df = _load(spark, sf, "documents").withColumn("_id", F.col("doc_id"))
    plan = SparkCompiler().compile(documents_schema())
    v = plan.apply(df, id_cols=["_id"]).violations()
    return (v.select(F.col("_id").alias("id"), "rule_id", "position",
                     "message", "value")
            .orderBy("id", "rule_id"))


def q_tpch_q1(spark, sf):
    df = _load(spark, sf, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(20,2)")  # noqa: E731
    return (df.filter(F.col("l_shipdate")
                    <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                 F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                 F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
                 .cast("double").alias("sum_disc_price"),
                 F.round(F.avg(dec("l_discount")).cast("double"), 6)
                 .alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_events_chi2(spark, sf):
    counts = drift.category_counts(_load(spark, sf, "events"), "event_type")
    total = counts.agg(F.avg("n").alias("exp"))
    return (counts.crossJoin(total)
            .agg(F.round(F.sum(F.pow(F.col("n") - F.col("exp"), 2)
                               / F.col("exp")), 6).alias("chi2"),
                 F.count(F.lit(1)).alias("n_categories")))


def q_ks_drift(spark, sf):
    ev = _load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "view")
    return drift.ks_exact(a, b, "value").select(
        F.round(F.col("ks"), 6).alias("ks"))


def q_dedup_prefix(spark, sf):
    df = _load(spark, sf, "documents").withColumn(
        "text", F.substring("text", 1, 20))
    return (dedup.exact_duplicates(df)
            .select("fingerprint", "n_docs")
            .orderBy("fingerprint"))


def q_dedup_keep(spark, sf):
    """exact_dedup keep-one: min doc_id survives per normalized-prefix
    group (validr_spark/operators/dedup.py exact_dedup)."""
    df = _load(spark, sf, "documents").withColumn(
        "text", F.substring("text", 1, 20))
    return (dedup.exact_dedup(df)
            .select("doc_id").orderBy("doc_id"))


def q_dedup_best(spark, sf):
    """exact_dedup keep-best: highest n_chars survives per
    normalized-prefix group, ties to min doc_id (keep_by election,
    validr_spark/operators/dedup.py exact_dedup)."""
    df = _load(spark, sf, "documents").withColumn(
        "text", F.substring("text", 1, 20))
    return (dedup.exact_dedup(df, keep_by=F.col("n_chars"))
            .select("doc_id").orderBy("doc_id"))


def q_incremental_new(spark, sf):
    """Incremental dedup of a 'new batch' (doc_id % 3 == 0) against the
    'existing corpus' (the rest): bloom-prefiltered membership, exact
    anti-join confirmation of bloom positives
    (validr_spark/operators/incremental.py).  The 20-char prefix stands
    in for the text (as in dedup_prefix/dedup_keep) so genuine
    cross-split duplicates exist in the fixture data."""
    from validr_spark.operators.incremental import incremental_new_rows
    df = _load(spark, sf, "documents").withColumn(
        "text", F.substring("text", 1, 20))
    new = df.filter(F.col("doc_id") % 3 == 0)
    ref = df.filter(F.col("doc_id") % 3 != 0)
    return (incremental_new_rows(new, ref, fpp=0.01)
            .select("doc_id").orderBy("doc_id"))


def q_emb_drift(spark, sf):
    """Embedding moment drift (operators/embedding.py) between the two
    vec_id-parity halves of the embeddings table: per-dim two-sample mean
    z-scores from mapInPandas moment partials; DuckDB recomputes the
    moments with zip-unnest + var_pop."""
    from validr_spark.operators.embedding import embedding_drift
    emb = _load(spark, sf, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    return embedding_drift(a, b)


def q_dup_spans(spark, sf):
    """Exact repeated-substring spans (operators/spans.py, Lee et al.
    granularity): maximal per-doc word-index ranges duplicated verbatim
    across ≥2 documents, global-first-occurrence survivor marked keep.
    DuckDB rebuilds the 8-gram positions with list_transform slices and
    the same gaps-and-islands window."""
    from validr_spark.operators.spans import duplicate_spans
    df = _load(spark, sf, "documents")
    s = duplicate_spans(df, n=8)
    return (s.select("doc_id",
                     F.col("start_word").cast("long").alias("start_word"),
                     F.col("end_word").cast("long").alias("end_word"),
                     "n_grams", "keep")
            .orderBy("doc_id", "start_word"))


def q_doc_entropy(spark, sf):
    """Per-doc word-distribution Shannon entropy (operators/textstats.py
    word_entropy) — the lexical-diversity quality signal; DuckDB twin
    recomputes it from split-regex word counts."""
    from validr_spark.operators.textstats import word_entropy
    return (word_entropy(_load(spark, sf, "documents"))
            .orderBy("doc_id"))


def q_src_entropy(spark, sf):
    """Per-source language-mix entropy (operators/drift.py value_entropy)
    — the generic distribution-diversity drift signal."""
    from validr_spark.operators.drift import value_entropy
    return (value_entropy(_load(spark, sf, "documents"), "lang",
                          by=["source"])
            .orderBy("source"))


def q_span_cut(spark, sf):
    """ExactSubstr deletion (operators/spans.py cut_duplicate_spans):
    every non-surviving duplicated 8-gram span removed in place, original
    case preserved.  DuckDB rebuilds the cut texts with the same window
    CTEs plus an ordered string_agg."""
    from validr_spark.operators.spans import cut_duplicate_spans
    df = _load(spark, sf, "documents").filter(F.col("text").isNotNull())
    return cut_duplicate_spans(df, n=8).orderBy("doc_id")


def q_doc_logprob(spark, sf):
    """Unigram LM-quality proxy (operators/textstats.py unigram_logprob,
    exact mode): even-doc_id documents scored under the word distribution
    of the odd-doc_id half; OOV words floored at 0.5/N.  DuckDB twin
    rebuilds the count model and the log2 scoring."""
    from validr_spark.operators.textstats import unigram_logprob
    df = _load(spark, sf, "documents")
    even = df.filter(F.col("doc_id") % 2 == 0)
    odd = df.filter(F.col("doc_id") % 2 == 1)
    return unigram_logprob(even, ref=odd).orderBy("doc_id")


def q_para_dedup(spark, sf):
    """C4-style corpus line dedup (operators/paradedup.py): documents'
    words become lines (guaranteeing cross-doc duplicates), first global
    occurrence survives, short lines exempt.  Per-doc kept/removed
    counts; DuckDB reproduces the survivor rule with a window over
    trimmed-line equality."""
    from validr_spark.operators.paradedup import dedup_paragraphs
    df = (_load(spark, sf, "documents")
          .filter(F.col("text").isNotNull() & (F.col("text") != ""))
          .select("doc_id",
                  F.regexp_replace("text", " +", "\n").alias("text")))
    out = dedup_paragraphs(df, min_chars=4)
    return out.select("doc_id", "n_lines", "n_removed").orderBy("doc_id")


def q_tokenized_stats(spark, sf):
    """Hash-vocabulary tokenization (operators/tokenize.py) over
    documents: per-source doc counts and token totals.  The DuckDB twin
    recomputes the piece segmentation with the same regex (the hashed ids
    themselves are xxhash64-based, so the oracle pins segmentation +
    n_tok, and pytest pins id range/determinism)."""
    from validr_spark.operators.tokenize import tokenize_documents
    df = _load(spark, sf, "documents")
    seq = tokenize_documents(df, vocab=50_257)
    return (seq.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.max("n_tok").alias("max_tokens"))
            .orderBy("source"))


def q_token_counts(spark, sf):
    df = _load(spark, sf, "documents")
    tc = textstats.token_count(F.col("text"))
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
        F.round(F.avg(tc), 4).alias("avg_tokens"),
    )


def q_lang_hist(spark, sf):
    df = _load(spark, sf, "documents")
    from pyspark.sql import Window

    return (df.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
            .withColumn("share", F.round(
                F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()),
                6))
            .orderBy("lang"))


def q_ann_topk(spark, sf):
    emb = _load(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return (similarity.cosine_topk(emb.filter(F.col("vec_id") != 0),
                                   [float(x) for x in query], k=10)
            .select("vec_id", F.round(F.col("cosine"), 6).alias("cosine")))


def q_embedding_stats(spark, sf):
    emb = _load(spark, sf, "embeddings")
    e = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, v: a + v * v))
    return emb.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min(F.size("embedding")).cast("long").alias("min_dim"),
        F.max(F.size("embedding")).cast("long").alias("max_dim"),
        F.round(F.avg(norm), 4).alias("avg_norm"),
    )


def q_events_validate(spark, sf):
    ev = _load(spark, sf, "events")
    schema = T.dict(
        event_type=T.enum("click view signup error"),   # 'purchase' excluded
        value=T.float.min(0).max(450),
        user_id=T.int.min(0),
    )
    plan = SparkCompiler().compile(schema)
    return plan.apply(ev).violations().groupBy("rule_id").agg(
        F.count(F.lit(1)).alias("n_violations")).orderBy("rule_id")


def q_doc_profile(spark, sf):
    from validr_spark.operators.stats import column_profile

    df = _load(spark, sf, "documents")
    return (column_profile(df, ["doc_id", "text", "lang", "n_chars"])
            .select("column", "n_rows", "n_nulls",
                    F.round("null_rate", 6).alias("null_rate"),
                    F.round("min", 4).alias("min_v"),
                    F.round("max", 4).alias("max_v"),
                    F.round("avg", 4).alias("avg_v"))
            .orderBy("column"))


def q_chars_quantiles(spark, sf):
    from validr_spark.operators.stats import length_distribution

    df = _load(spark, sf, "documents")
    q = length_distribution(df, "n_chars", [0.0, 0.25, 0.5, 0.75, 1.0],
                            exact=True)
    e = F.col("quantiles")
    return q.select(*[F.round(e[i].cast("double"), 4).alias(f"q{i}")
                      for i in range(5)])


def q_orphan_rows(spark, sf):
    from validr_spark.operators.referential import orphan_violations

    orders = _load(spark, sf, "orders")
    cust = (_load(spark, sf, "customer")
            .select(F.col("c_custkey").alias("o_custkey")))
    return (orphan_violations(orders, cust, key="o_custkey",
                              id_col="o_orderkey")
            .orderBy("o_orderkey"))


def q_dup_keys_salted(spark, sf):
    from validr_spark.operators.uniqueness import duplicate_keys

    df = _load(spark, sf, "documents")
    return (duplicate_keys(df, "doc_id", two_phase=True)
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# scalar-validator corpora (VERDICT r01 #3): embedded VALUES corpora drawn
# from the reference's per-validator case tables
# (/root/reference/tests/validators/test_ipv4.py, test_uuid.py, test_email.py,
# test_phone.py, test_slug.py, test_fqdn.py, test_url.py, test_date.py,
# test_datetime.py, test_timedelta.py, test_bool.py, test_str.py …), run
# through the Spark rule compilers AND hand-matched DuckDB SQL.  The corpus
# constants below are the single source of truth for BOTH sides.
# ---------------------------------------------------------------------------

_NET_COLS = ["rid", "ip", "host", "uid", "link", "mail", "tel", "tag", "idc"]
_NET_ROWS = [
    (0, "127.0.0.1", "example.com",
     "123e4567-e89b-12d3-a456-426614174000",
     "https://example.com/path?q=1", "someone@example.com",
     "13812345678", "hello-world-123", "110105194912310021"),
    (1, " 1.2.3.4 ", "a-b.cn", "123E4567E89B12D3A456426614174000",
     "https://sub.example.org/x", "a.b-c@test-domain.org",
     "+8613812345678", "a", "110105491231002"),
    (2, "0.0.0.0", "www.example.org.",
     "urn:uuid:123e4567-e89b-12d3-a456-426614174000",
     None, None, None, "abc-123", None),
    (3, "255.255.255.255", None,
     "{123e4567-e89b-12d3-a456-426614174000}", None, None, None, None, None),
    (4, "256.1.1.1", "-bad.com", "xyz", "http://example.com",
     "not-an-email", "12345", "Hello-World", "1234"),
    (5, "1.2.3", "x", "123e4567-e89b-12d3-a456-42661417400",
     "ftp://x.org", "a@@b.com", "1234567890123456", "hello_world",
     "12345678901234567"),
    (6, "abc", "a..b", None, "example.com", "@example.com", None,
     "-lead", None),
    (7, "1.2.3.4.5", None, None, "https://" + "a" * 260, None, None,
     None, None),
    (8, "", "", "", "", "", "", "", ""),
    (9, None, None, None, None, None, None, None, None),
]

_TEMPORAL_COLS = ["rid", "d", "t", "dt", "td", "flag"]
_TEMPORAL_ROWS = [
    (0, "2016-7-9", "11:22:33", "2016-07-09T11:22:33.123Z", "10s", "yes"),
    (1, "2016-07-09", "1:2:3", "2016-07-09T00:00:00.123456Z", "2h", "Off"),
    (2, "1999-12-31", "23:59:59", "2020-02-29T12:00:00.5Z", "1.5h", "1"),
    (3, "2016-13-01", "25:00:00", "2016-7-9 11:22:33", "-3s", "x"),
    (4, "x", "x", "x", "61", "TRUE"),
    (5, "", "", "", "250ms", "0"),
    (6, None, None, None, None, None),
]

_STRNUM_COLS = ["rid", "s", "m", "i", "f", "ns"]
_STRNUM_ROWS = [
    (0, "  pad  ", "abc", "5", "0.5", "plain"),
    (1, "a<b>&\"c'", "ABC", " 7 ", "0", ""),
    (2, "", "abc1", "1.5", "x", None),
    (3, None, None, "-12", "1e3", "x&y"),
    (4, "no-change", "zz", "abc", "-0.25", "42"),
]


def _net_schema():
    return T.dict(
        ip=T.ipv4.optional, host=T.fqdn.optional, uid=T.uuid.optional,
        link=T.url.scheme("https").optional, mail=T.email.optional,
        tel=T.phone.optional, tag=T.slug.optional, idc=T.idcard.optional)


def _temporal_schema():
    return T.dict(d=T.date.optional, t=T.time.optional,
                  dt=T.datetime.optional, td=T.timedelta.optional,
                  flag=T.bool.optional)


def _strnum_schema():
    return T.dict(s=T.str.strip.escape.optional,
                  m=T.str.match("[a-z]+").optional,
                  i=T.int.min(-100).max(1000).optional,
                  f=T.float.exmin(0).optional,
                  ns=T.nstr.optional)


def _corpus_df(spark, rows, cols):
    ddl = ", ".join(f"{c} {'int' if c == 'rid' else 'string'}" for c in cols)
    return spark.createDataFrame(rows, ddl)


def _corpus_apply(spark, rows, cols, schema):
    df = _corpus_df(spark, rows, cols).withColumn("_id", F.col("rid"))
    return SparkCompiler().compile(schema).apply(df, id_cols=["_id"])


def _coerced_with_rules(res, cols):
    """(rid, <coerced cols>, rules) — rules = comma-joined rule_ids in
    schema-field order (what _violations already is)."""
    rules = F.concat_ws(
        ",", F.transform(F.col("_violations"), lambda v: v["rule_id"]))
    return (res.df.select(F.col("_id").alias("rid"),
                          *[c for c in cols if c != "rid"],
                          rules.alias("rules"))
            .orderBy("rid"))


def q_scalar_net_violations(spark, sf):
    """ipv4/fqdn/uuid/url/email/phone/slug/idcard: violation rows with
    exact rule_id/position/message/value parity."""
    res = _corpus_apply(spark, _NET_ROWS, _NET_COLS, _net_schema())
    return (res.violations()
            .select(F.col("_id").alias("rid"), "rule_id", "position",
                    "message", "value")
            .orderBy("rid", "rule_id"))


def q_scalar_net_coerced(spark, sf):
    """Same corpus: canonicalized outputs (uuid re-dashing, fqdn trailing
    dot, ipv4 strip, optional '' semantics) + per-row rule list."""
    res = _corpus_apply(spark, _NET_ROWS, _NET_COLS, _net_schema())
    return _coerced_with_rules(res, _NET_COLS)


def q_scalar_temporal(spark, sf):
    """date/time/datetime (lenient-strptime canonicalization), timedelta
    (Go-duration → seconds), bool truthy table — coerced outputs."""
    res = _corpus_apply(spark, _TEMPORAL_ROWS, _TEMPORAL_COLS,
                        _temporal_schema())
    out = _coerced_with_rules(res, _TEMPORAL_COLS)
    return out.withColumn("td", F.round(F.col("td").cast("double"), 6))


def q_scalar_strnum(spark, sf):
    """str strip/escape/match, int/float string coercion with open bounds,
    nstr null-vs-empty semantics — coerced outputs."""
    res = _corpus_apply(spark, _STRNUM_ROWS, _STRNUM_COLS, _strnum_schema())
    out = _coerced_with_rules(res, _STRNUM_COLS)
    return out.withColumn("f", F.round(F.col("f").cast("double"), 6))


def _values_sql(rows, cols) -> str:
    def lit(v):
        if v is None:
            return "NULL::VARCHAR"
        if isinstance(v, int):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"
    vals = ",\n              ".join(
        "(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES {vals}) AS corpus({', '.join(cols)})"


# --- rows-only queries (non-SQL-expressible; weaker driver check) ----------

def q_minhash_pairs(spark, sf):
    """Minhash LSH candidate pairs.  Rows-only: signatures are xxhash64
    (no DuckDB counterpart); the identical banding pipeline over
    md5-derived signatures is hash-oracled end-to-end as
    minhash_oracle."""
    df = _load(spark, sf, "documents")
    return (dedup.minhash_candidates(df, num_hashes=32, bands=8)
            .filter(F.col("n_bands_matched") >= 2)
            .orderBy("id_a", "id_b"))


def q_minhash_oracle(spark, sf):
    """Portable-family minhash LSH candidate pairs (operators/dedup.py
    minhash_candidates_portable): md5-derived integer shingle hashes,
    affine-mod-p signature family, value-string band buckets — every
    step reproducible by an independent SQL engine, so DuckDB rebuilds
    the EXACT candidate-pair set.  This differentially proves the whole
    banding pipeline (shingle -> signature -> band -> bucket self-join
    -> pair agg); the xxhash64 production family in minhash_pairs has no
    DuckDB twin and stays rows-only."""
    df = _load(spark, sf, "documents")
    return (dedup.minhash_candidates_portable(df, num_hashes=32, bands=8)
            .filter(F.col("n_bands_matched") >= 2)
            .orderBy("id_a", "id_b"))


def _minhash_band_cte(num_hashes: int = 32, bands: int = 8,
                      seed: int = 42) -> str:
    """Shared CTE chain replaying the portable minhash banding
    (shingle → md5 hash → affine-mod-p signature → band buckets →
    ``pairs(id_a, id_b)``, one row per matching band), generated from
    the SAME portable_hash_params constants the Spark operator inlines
    — one source of truth for the hash family.  Used by the
    minhash_oracle twin and (since round 5) chained into the
    ngram_jaccard verify twin."""
    p = dedup.MERSENNE31
    params = dedup.portable_hash_params(num_hashes, seed)
    rows = num_hashes // bands
    mins = ",\n                   ".join(
        f"min(({a} * m + {b}) % {p}) AS h{i}"
        for i, (a, b) in enumerate(params))
    band_rows = "\n            UNION ALL ".join(
        "SELECT doc, {b} AS band, {key} AS key FROM sig".format(
            b=b, key=" || ',' || ".join(
                f"h{b * rows + j}::VARCHAR" for j in range(rows)))
        for b in range(bands))
    return f"""pre AS (
              SELECT doc_id AS doc,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
              FROM documents WHERE text IS NOT NULL),
            pre2 AS (SELECT doc, s FROM pre WHERE length(s) > 0),
            g AS (
              SELECT doc,
                     unnest(list_transform(
                       generate_series(1, greatest(length(s) - 4, 1)),
                       i -> substr(s, i, 5))) AS gram
              FROM pre2),
            m AS (
              SELECT doc,
                     ('0x' || substr(md5(gram), 1, 12))::BIGINT
                       % {p} AS m
              FROM g),
            sig AS (
              SELECT doc,
                   {mins}
              FROM m GROUP BY doc),
            bands AS (
            {band_rows}
            ),
            pairs AS (
              SELECT l.doc AS id_a, r.doc AS id_b
              FROM bands l JOIN bands r
                ON l.band = r.band AND l.key = r.key AND l.doc < r.doc)"""


def _minhash_oracle_sql(num_hashes: int = 32, bands: int = 8,
                        seed: int = 42) -> str:
    """DuckDB twin of q_minhash_oracle (≥2 matching bands)."""
    return f"""
            WITH {_minhash_band_cte(num_hashes, bands, seed)}
            SELECT id_a, id_b, count(*)::BIGINT AS n_bands_matched
            FROM pairs GROUP BY 1, 2
            HAVING count(*) >= 2
            ORDER BY id_a, id_b
        """


def _ngram_jaccard_oracle_sql(num_hashes: int = 32, bands: int = 8,
                              seed: int = 42,
                              threshold: float = 0.4) -> str:
    """DuckDB twin of q_ngram_jaccard: the portable band CTE (≥1
    matching band = candidate) chained into the distinct word-3-gram
    Jaccard algebra the jaccard_exact twin proved."""
    return f"""
            WITH {_minhash_band_cte(num_hashes, bands, seed)},
            cand AS (SELECT DISTINCT id_a, id_b FROM pairs),
            w AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS ws
              FROM documents WHERE text IS NOT NULL),
            g3 AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 2, 0)),
                       i -> array_to_string(ws[i:i+2], ' '))) AS gram
              FROM w),
            sz AS (SELECT doc_id, count(*) AS n FROM g3 GROUP BY doc_id),
            inter AS (
              SELECT c.id_a, c.id_b, count(*) AS i
              FROM cand c
              JOIN g3 a ON a.doc_id = c.id_a
              JOIN g3 b ON b.doc_id = c.id_b AND b.gram = a.gram
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE i::DOUBLE / (sa.n + sb.n - i) >= {threshold}
            ORDER BY id_a, id_b
        """


def q_simhash_pairs(spark, sf):
    """Simhash near-dup pairs.  Rows-only: the 64-bit sketch hashes
    tokens with xxhash64 (no DuckDB counterpart); the same
    sketch/blocking pipeline over md5-derived bits is hash-oracled as
    simhash_oracle."""
    df = _load(spark, sf, "documents")
    return dedup.simhash_near_dups(df, max_hamming=8).orderBy("id_a", "id_b")


def q_simhash_oracle(spark, sf):
    """Portable 48-bit SimHash near-dup pairs (operators/dedup.py
    simhash_near_dups_portable): md5-derived word hashes, conditional-sum
    bit votes, 12-bit pigeonhole blocks, bit_count(xor) hamming — all
    engine-neutral integer arithmetic, so DuckDB reproduces the exact
    (id_a, id_b, hamming) set.  Differentially proves the simhash
    block-join pipeline; the production blake2b family in simhash_pairs
    has no DuckDB twin and stays rows-only."""
    df = _load(spark, sf, "documents")
    return (dedup.simhash_near_dups_portable(df, max_hamming=8)
            .orderBy("id_a", "id_b"))


def _simhash_oracle_sql(max_hamming: int = 8, blocks: int = 4) -> str:
    """DuckDB twin of q_simhash_oracle — same 48-bit md5 word-hash
    family, bit votes, blocking, and hamming filter."""
    width = 48 // blocks
    mask = (1 << width) - 1
    votes = ",\n                   ".join(
        f"sum(CASE WHEN (m >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS w{b}"
        for b in range(48))
    fp = " + ".join(
        f"(CASE WHEN w{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(48))
    block_rows = "\n            UNION ALL ".join(
        f"SELECT doc, fp, {b} AS block, (fp >> {b * width}) & {mask} AS key"
        " FROM fps"
        for b in range(blocks))
    return f"""
            WITH pre AS (
              SELECT doc_id AS doc,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
              FROM documents WHERE text IS NOT NULL),
            pre2 AS (SELECT doc, s FROM pre WHERE length(s) > 0),
            w AS (
              SELECT doc, unnest(string_split(s, ' ')) AS word FROM pre2),
            m AS (
              SELECT doc,
                     ('0x' || substr(md5(word), 1, 12))::BIGINT AS m
              FROM w WHERE word <> ''),
            sig AS (
              SELECT doc,
                   {votes}
              FROM m GROUP BY doc),
            fps AS (
              SELECT doc, ({fp})::BIGINT AS fp FROM sig),
            blockt AS (
            {block_rows}
            ),
            pairs AS (
              SELECT DISTINCT l.doc AS id_a, r.doc AS id_b,
                     bit_count(xor(l.fp, r.fp))::INTEGER AS hamming
              FROM blockt l JOIN blockt r
                ON l.block = r.block AND l.key = r.key AND l.doc < r.doc)
            SELECT id_a, id_b, hamming
            FROM pairs WHERE hamming <= {max_hamming}
            ORDER BY id_a, id_b
        """


def q_lsh_topk(spark, sf):
    """Random-hyperplane LSH top-k.  Rows-only: the hyperplanes are
    derived from a counter hash (similarity._hyperplanes) that DuckDB
    cannot re-run; recall vs the exact ann_topk oracle is pinned by
    tests/test_dedup_similarity.py."""
    emb = _load(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return similarity.lsh_topk(emb.filter(F.col("vec_id") != 0),
                               [float(x) for x in query], k=10, nbits=6)


def q_ivf_topk(spark, sf):
    """IVF approximate top-k (operators/similarity.ivf_topk) — hash-oracled
    (upgraded from rows-only in round 4): the coarse quantizer is pinned to
    the 32 lowest-vec_id embeddings (SQL-recomputable, unlike the default
    xxhash sample), so DuckDB replays probe selection, cell assignment
    (argmax tie-break = lowest centroid rank, matching np.argmax), and the
    in-probe exact ranking.  Same round-6 cosine projection as the
    driver-green ann_topk."""
    emb = _load(spark, sf, "embeddings")
    base = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cents = [r["embedding"] for r in
             base.orderBy("vec_id").select("embedding").limit(32).collect()]
    return (similarity.ivf_topk(base, [float(x) for x in query], k=10,
                                n_centroids=32, nprobe=16, centroids=cents)
            .select("vec_id", F.round(F.col("cosine"), 6).alias("cosine")))


def _textstats_sql_bits():
    from validr_spark.operators.textstats import STOPWORDS

    def inlist(sw):
        return ", ".join("'" + t + "'" for t in sw)
    return {lang: inlist(sw) for lang, sw in STOPWORDS.items()}


def q_repair_report(spark, sf):
    """Bulk repair loop (operators/repair.py): strict-validate documents,
    bulk-repair with the schema's own declared defaults (reference
    invalid_to_default wrapper semantics, pyx:381-421, lifted to an
    offline batch step), and report per-rule before/after/repaired
    counts.  lang and source declare defaults (repairable); n_chars has
    none (stays irreparable) — integer counts only in the hashed
    projection."""
    from validr_spark.operators.repair import repair

    df = _load(spark, sf, "documents")
    sch = T.dict(
        lang=T.enum("en de fr").default("en"),
        n_chars=T.int.min(1).max(400),
        source=T.str.minlen(1).maxlen(4).default("src0"),
    )
    strict_v = (SparkCompiler().compile(sch)
                .apply(df, id_cols=["doc_id"]).violations())
    rep = repair(sch, df, id_cols=["doc_id"]).report(strict_v)
    keep = ["lang.enum", "n_chars.max", "source.maxlen"]
    return (rep.filter(F.col("rule_id").isin(keep))
            .select("rule_id", "n_before", "n_after", "n_repaired")
            .orderBy("rule_id"))


def q_text_profile(spark, sf):
    df = _load(spark, sf, "documents")
    prof = textstats.text_profile(df)
    return (prof.groupBy("lang_detected")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("quality"), 4).alias("avg_quality"))
            .orderBy("lang_detected"))


def q_sequences_validate(spark, sf):
    """Flagship north-star pipeline on the generated sequences table.
    Rows-only: the input is datagen-generated in-session (not a
    pre-registered view; generation uses xxhash64); the same validation
    semantics over view-derived synthetic sequences are hash-oracled by
    sequences_oracle and frame_check."""
    from validr_spark.datagen import make_sequences, sequences_schema

    seq = make_sequences(spark, 20_000, maxlen=128)
    plan = SparkCompiler().compile(sequences_schema())
    res = plan.apply(seq, id_cols=["doc_id"])
    return res.summary()


def q_file_layout(spark, sf):
    """Physical-layout report (operators/files.py small_file_advice) over
    four of the testdata tables — rows-only (the oracle contract is
    view-based; file bytes aren't reachable from the pre-registered
    views).  pytest hash-checks file_report against os.stat and DuckDB's
    parquet_file_metadata instead."""
    from validr_spark.operators.files import small_file_advice
    paths = [f"{sf}/{t}.parquet"
             for t in ("documents", "events", "lineitem", "orders")]
    return small_file_advice(spark, paths)


def q_manifest_run(spark, sf):
    """Resumable manifest-checkpointed run (plans/manifest.py) over the
    generated sequences table; returns the per-partition verdict rows.
    Rows-only: the run writes/reads checkpoint state across batches
    (iterative, side-effecting) — not a SQL expression; resume/idempotency
    invariants are pinned by tests/test_plans_streaming.py."""
    import tempfile

    from validr_spark.compiler import SparkCompiler
    from validr_spark.datagen import make_sequences, sequences_schema
    from validr_spark.plans import ManifestStore, ResumableValidation

    tmp = tempfile.mkdtemp(prefix="vs_manifest_")
    seq = make_sequences(spark, 20_000, maxlen=64)
    plan = SparkCompiler().compile(sequences_schema())
    rv = ResumableValidation(plan, part_col="source",
                             manifest_path=f"{tmp}/manifest",
                             violations_path=f"{tmp}/violations")
    rv.run(spark, seq, id_cols=["doc_id"])
    return (ManifestStore(spark, f"{tmp}/manifest").read()
            .select("part", "n_rows", "n_bad_rows", "n_violations", "verdict")
            .orderBy("part"))


def q_ngram_jaccard(spark, sf):
    """End-to-end near-dup pipeline: LSH candidates → exact word-3-gram
    Jaccard verify (dedup.ngram_jaccard_pairs).  HASH-ORACLED since
    round 5 (upgraded from rows-only via the r4 pinnable-override
    pattern): ``portable=True`` generates candidates with the
    md5/affine family whose banding DuckDB replays exactly
    (minhash_oracle proved that half), and the twin chains the same
    band CTE into the distinct-gram Jaccard algebra jaccard_exact
    proved — so the composed candidates→verify pipeline is now
    value-verified, not just its halves.  The xxhash64 production
    family stays covered rows-only by minhash_pairs."""
    df = _load(spark, sf, "documents")
    return (dedup.ngram_jaccard_pairs(df, ngram=3, threshold=0.4,
                                      portable=True, num_hashes=32,
                                      bands=8)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
            .orderBy("id_a", "id_b"))


def q_jaccard_exact(spark, sf):
    """Exact word-3-gram Jaccard verifier (operators/dedup.py
    jaccard_verify) over a DETERMINISTIC candidate set (all doc pairs with
    ids < 60) — oracles the near-dup verify component itself, independent
    of minhash candidate generation; DuckDB recomputes set Jaccard from
    distinct grams."""
    df = _load(spark, sf, "documents").filter(F.col("doc_id") < 60)
    a = df.select(F.col("doc_id").alias("id_a"))
    b = df.select(F.col("doc_id").alias("id_b"))
    cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (dedup.jaccard_verify(df, cand, ngram=3, threshold=0.01)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
            .orderBy("id_a", "id_b"))


def q_resample(spark, sf):
    """Gap-filled daily event rollup (operators/temporal.py resample):
    one row per (event_type, day bucket) between each type's first and
    last event, empty days included with n_events=0.  value sums go
    through DECIMAL(18,6) so both engines add exactly (double sums are
    order-dependent); the final column is the rounded double."""
    from validr_spark.operators.temporal import resample
    ev = (_load(spark, sf, "events")
          .withColumn("value", F.col("value").cast("decimal(18,6)")))
    out = resample(ev, "ts", 86400, key_col="event_type",
                   value_col="value")
    return out.select(
        "event_type", "bucket", "n_events",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"))


def q_vocab(spark, sf):
    """Learned frequency-ranked vocabulary (operators/tokenize.py
    build_vocab): top-200 BPE-ish pieces with deterministic ids and the
    cumulative coverage curve; DuckDB reruns the identical piece regex
    and windowed running coverage."""
    from validr_spark.operators.tokenize import build_vocab
    df = _load(spark, sf, "documents")
    return build_vocab(df, top_v=200)


def q_vocab_coverage(spark, sf):
    """Per-source OOV report (operators/tokenize.py vocab_coverage) for
    the top-200 learned vocabulary against the full documents corpus —
    DuckDB rebuilds the same vocab CTE and counts OOV piece occurrences
    per source.  Hashed columns are integer-only: the OOV rate ships as
    floor(1e6·n_oov/n_pieces) ppm so a DuckDB-version round() drift
    can't flake the hash (the rounded-double `oov_rate` itself is
    pytest-pinned in tests/test_tokenize.py)."""
    from validr_spark.operators.tokenize import build_vocab, vocab_coverage
    df = _load(spark, sf, "documents")
    vocab = build_vocab(df, top_v=200)
    cov = vocab_coverage(df, vocab, by="source")
    return cov.select(
        "source", "n_pieces", "n_oov",
        F.expr("(1000000 * n_oov) div n_pieces").alias("oov_ppm"))


def q_table_fp(spark, sf):
    """Order-insensitive table fingerprint (operators/stats.py
    table_fingerprint) of four lineitem columns (ints + a flag string —
    cross-engine-stable renderings); DuckDB recomputes the md5/bit_xor
    combine exactly."""
    from validr_spark.operators.stats import table_fingerprint
    li = _load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_returnflag")
    return table_fingerprint(li)


def q_psi_groups(spark, sf):
    """Per-group PSI in one pass (operators/drift.py psi_by_group):
    even event_ids as reference vs odd as new, grouped by event_type —
    the fleet-monitoring shape (two aggregates for all groups, not two
    jobs per group)."""
    from validr_spark.operators.drift import psi_by_group
    ev = _load(spark, sf, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 == 1)
    return psi_by_group(ref, new, "value", by="event_type", bins=10)


def q_value_variants(spark, sf):
    """Enum-rot detector (operators/suggest.py value_variants) on the
    documents lang column with deterministic case/whitespace corruption
    (doc_id%11==0 uppercases, ==1 appends a space); DuckDB rebuilds the
    clusters with an ordered list aggregate."""
    from validr_spark.operators.suggest import value_variants
    df = _load(spark, sf, "documents")
    corrupted = df.withColumn(
        "lang",
        F.when(F.col("doc_id") % 11 == 0, F.upper("lang"))
        .when(F.col("doc_id") % 11 == 1, F.concat("lang", F.lit(" ")))
        .otherwise(F.col("lang")))
    vv = value_variants(corrupted, "lang")
    # Render the bounded variant list as a '|'-joined scalar — the
    # correctness driver hashes scalar cells only (a raw array column
    # crashed its canonicalizer in round 2, CORRECTNESS_r02).
    return vv.select(
        "key", "canonical", "n_variants", "n_rows",
        F.concat_ws("|", "variants").alias("variants"))


def q_clean_text(spark, sf):
    """Text repair pass (operators/encoding.py clean_text) over a FULLY
    SYNTHETIC text column derived from doc_id (doc_id%7==0 rows carry a
    leading control char, internal double spaces, and a trailing
    zero-width + decomposed accent); per-source doc count and total
    cleaned length.  Text is synthetic — not corpus-derived — so the
    oracle's regex chain and nfc_normalize act only on controlled
    literals and no DuckDB-version Unicode/regex behavior over
    arbitrary corpus bytes can leak into the hash (round-3 armoring of
    a CORRECTNESS_r02 hash-FAIL; the operator runs over the real corpus
    in the pytest suite)."""
    from validr_spark.operators.encoding import clean_text
    df = _load(spark, sf, "documents")
    d = F.col("doc_id")
    base = F.concat(F.lit("doc "), (d % 13).cast("string"),
                    F.lit(" body"))
    messy = F.when(
        d % 7 == 0,
        F.concat(F.lit("\x01  "), base,
                 F.lit("  \u200b e\u0301")))\
        .otherwise(base)
    cleaned = clean_text(df.select("source", "doc_id")
                         .withColumn("text", messy))
    return (cleaned.groupBy("source")
            .agg(F.count("text").alias("n_docs"),
                 F.sum(F.length("text")).alias("total_chars"))
            .orderBy("source"))


def q_position_stats(spark, sf):
    """Per-position token distribution (operators/sequences.py
    position_token_stats — the template detector for pre-tokenized
    corpora) over sequences derived deterministically from documents
    (position 0/1 near-uniform, position 2/3 low-cardinality); DuckDB
    re-derives the same arrays and per-position aggregates.  Only the
    INTEGER columns are hashed: top_share/entropy are log- and
    division-derived doubles whose last ulp differs across engine
    versions (the round-2 hash-FAIL mode) — they are pytest-pinned with
    tolerance in tests/test_sequences_fastpath.py instead."""
    from validr_spark.operators.sequences import position_token_stats
    df = _load(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
    d = F.col("doc_id")
    toks = F.array((d % 97 + 10).cast("int"),
                   (F.col("n_chars") % 89 + 10).cast("int"),
                   (d % 7).cast("int"), (d % 5).cast("int"))
    seq = df.select(toks.alias("tokens"))
    return position_token_stats(seq, max_pos=4).select(
        "pos", "n_seqs", "n_distinct_tokens", "top_token")


def q_token_repetition(spark, sf):
    """Per-sequence token n-gram repetition profile (operators/sequences.py
    token_ngram_stats — the degenerate-generation detector over the
    north-rule tokens shape) on sequences derived deterministically from
    documents: every 5th doc gets a single-token loop appended, every 7th
    a repeated two-token phrase, so loop_frac and dup_ngram_frac separate
    the two failure modes.  The DuckDB twin re-derives the same arrays
    and bigram counts via list_transform slicing.  Hashed doubles are
    division-derived ratios of small integers only (IEEE-exact both
    engines; no log/pow — the round-2 hash-FAIL mode)."""
    from validr_spark.operators.sequences import token_ngram_stats

    df = _load(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
    d = F.col("doc_id")
    b1 = (d % 31 + 5).cast("int")
    b2 = (F.col("n_chars") % 29 + 40).cast("int")
    b3 = (d % 23 + 70).cast("int")
    b4 = ((d + F.col("n_chars")) % 19 + 100).cast("int")
    empty = F.array().cast("array<int>")
    toks = F.concat(
        F.array(b1, b2, b3, b4),
        F.when(d % 5 == 0, F.array(b1, b1, b1)).otherwise(empty),
        F.when(d % 7 == 0, F.array(b2, b3, b2, b3)).otherwise(empty))
    seq = df.select(d.cast("string").alias("doc_id"), toks.alias("tokens"))
    return token_ngram_stats(seq).orderBy("doc_id")


def q_pipeline_seq(spark, sf):
    """End-to-end sequence-shaped prep pipeline (pipeline.py
    prepare_sequences): validate → exact content dedup → token-gram
    decontaminate, over sequences derived from documents — content
    groups of three exact dups (token runs [13g, 13g+11], disjoint by
    construction so no accidental cross-group grams), every 13th doc
    made invalid (-1 token prepended), groups with g%30==0 contaminated
    via a benchmark built from their leaders (an invalid leader's
    -1-prefixed array still carries the clean grams in its tail, so the
    group stays contaminated — covered by the closed form).  The DuckDB
    twin recomputes the surviving set from the same injection
    arithmetic."""
    from validr_spark.pipeline import prepare_sequences

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    d = F.col("doc_id")
    g = d - d % 3
    clean = F.array(*[(g * 13 + k).cast("int") for k in range(12)])
    toks = F.when(d % 13 == 0,
                  F.concat(F.array(F.lit(-1).cast("int")), clean)) \
            .otherwise(clean)
    seq = df.select(
        d.cast("string").alias("doc_id"), toks.alias("tokens"),
        F.size(toks).alias("n_tok"),
        F.when(d % 2 == 0, F.lit("web")).otherwise(F.lit("code"))
        .alias("source"), (d % 30).alias("_m30"))
    schema = T.dict(
        doc_id=T.str.minlen(1).maxlen(64),
        tokens=T.list(T.int.min(0).max(100002)).minlen(1).maxlen(8192),
        n_tok=T.int.min(1).max(8192),
        source=T.enum("web code"),
    )
    bench = seq.filter(F.col("_m30") == 0).select("tokens")
    # checkpoint=True: the decontaminate stage references the validated+
    # deduped lineage three times (totals, grams, anti-join); without the
    # stage barrier Catalyst clones the full flag-projection expression
    # tree into each branch and optimization itself blows up
    res = prepare_sequences(seq.drop("_m30"), schema, benchmark=bench,
                            pack=False, collect_stats=False,
                            checkpoint=True)
    return (res.kept.select("doc_id", "n_tok")
            .orderBy(F.col("doc_id").cast("bigint")))


def q_token_contamination(spark, sf):
    """Token-n-gram benchmark decontamination on the pre-tokenized shape
    (operators/contamination.py token_contamination_scan): arithmetic
    stride-997 token streams (no accidental cross-doc gram overlap);
    docs with doc_id%50==0 form the benchmark (fully contaminated by
    construction), docs with %25==0 but %50!=0 copy the first 9 tokens
    of benchmark doc d-25 (2 of 5 grams shared, fraction 0.4), the rest
    are clean.  DuckDB recomputes the gram join with comma-rendered
    string grams over the same arrays."""
    from validr_spark.operators.contamination import token_contamination_scan

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    d = F.col("doc_id")

    def tk(e, k):
        return ((e * 997 + k) % 100003).cast("int")

    toks = F.array(*[
        F.when((d % 50 != 0) & (d % 25 == 0) & F.lit(k < 9),
               tk(d - 25, k)).otherwise(tk(d, k))
        for k in range(12)])
    corpus = df.select(d.cast("string").alias("doc_id"),
                       toks.alias("tokens"), (d % 50).alias("_m"))
    bench = corpus.filter(F.col("_m") == 0).select("tokens")
    return (token_contamination_scan(corpus.drop("_m"), bench, n=8)
            .orderBy("doc_id"))


def q_dedup_sequences(spark, sf):
    """Exact token-array content dedup (operators/dedup.py
    dedup_sequences) over sequences derived from documents in groups of
    five sharing one array (survivor = min id), with every 41st doc
    given a NULL-ELEMENT array that must pass through un-deduped (the
    concat_ws hole guard).  The DuckDB twin re-derives the arrays and
    recomputes survivors by grouping on the LIST value itself."""
    from validr_spark.operators.dedup import dedup_sequences

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    d = F.col("doc_id")
    g = d - d % 5

    def tok(e, m, o):
        return (e % m + o).cast("int")

    normal = F.array(tok(g, 31, 5), tok(g, 29, 3),
                     tok(g, 23, 7), tok(g, 19, 2))
    holed = F.array(tok(d, 31, 5), F.lit(None).cast("int"),
                    tok(d, 23, 7))
    toks = F.when(d % 41 == 0, holed).otherwise(normal)
    seq = df.select(d.cast("string").alias("doc_id"), toks.alias("tokens"))
    return (dedup_sequences(seq)
            .select("doc_id", F.size("tokens").alias("n_tok"))
            .orderBy("doc_id"))


def q_preference_check(spark, sf):
    """Preference-pair structural validation (operators/dialog.py
    preference_violations — identical / formatting-only pairs, missing
    fields) over pairs synthesized from documents with one injected
    defect class per modulus (first-match-wins, closed-form expected
    rows — the dialog_check armor pattern)."""
    from validr_spark.operators.dialog import preference_violations

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    d = F.col("doc_id")
    ds = d.cast("string")
    same = F.concat(F.lit("same-"), ds)
    base_p = F.concat(F.lit("p-"), ds)
    base_c = F.concat(F.lit("good answer "), ds)
    base_r = F.concat(F.lit("bad "), ds)
    nul = F.lit(None).cast("string")
    m23, m19 = d % 23 == 0, d % 19 == 0
    m17, m13, m11 = d % 17 == 0, d % 13 == 0, d % 11 == 0
    prompt = F.when(m23 | m19, base_p).when(m17, nul).otherwise(base_p)
    chosen = (F.when(m23, same)
              .when(m19, F.concat(F.lit("AN  ANSWER "), ds))
              .when(m17, base_c)
              .when(m13, F.lit(""))
              .otherwise(base_c))
    rejected = (F.when(m23, same)
                .when(m19, F.concat(F.lit("an answer "), ds))
                .when(m17 | m13, base_r)
                .when(m11, nul)
                .otherwise(base_r))
    pairs = df.select(ds.alias("doc_id"), prompt.alias("prompt"),
                      chosen.alias("chosen"), rejected.alias("rejected"))
    return preference_violations(pairs).orderBy("doc_id", "rule_id")


def _synth_dialog_turns():
    """The shared synthetic-dialog turns Column used by q_dialog_check,
    q_dialog_render, q_loss_mask, and q_turn_stats — one injected defect
    class per modulus, first-match-wins, every case a closed-form
    function of doc_id.  ONE definition on the Spark side so the four
    queries cannot drift apart; the loss_mask and turn_stats DuckDB
    twins replicate the same CASE ladder (kept in lockstep by their
    driver hash checks)."""
    d = F.col("doc_id")
    ds = d.cast("string")

    def turn(role, content):
        return F.struct(F.lit(role).alias("role"),
                        content.alias("content"))

    sys0 = turn("system", F.concat(F.lit("sys-"), ds))
    usr = turn("user", F.concat(F.lit("u-"), ds))
    asst = turn("assistant", F.concat(F.lit("a-"), ds))
    ttype = "array<struct<role:string,content:string>>"
    return (
        F.when(d % 23 == 0, F.array().cast(ttype))
        .when(d % 19 == 0, F.array(sys0, turn("system", F.lit("late")),
                                   usr, asst))
        .when(d % 17 == 0, F.array(sys0, turn("tool", F.lit("beep")),
                                   asst))
        .when(d % 13 == 0, F.array(sys0, turn("user", F.lit("")), asst))
        .when(d % 11 == 0, F.array(sys0, usr, asst,
                                   turn("user", F.lit("bye"))))
        .otherwise(F.array(sys0, usr, asst)))


def q_dialog_render(spark, sf):
    """Dialog → training-text rendering (operators/dialog.py
    render_dialogs) over the SAME synthesized dialogs as dialog_check;
    the DuckDB twin rebuilds each case's full rendered string
    closed-form (independent concatenation, chr(10) separators), so the
    shuffle-reassembly ordering is verified byte-for-byte."""
    from validr_spark.operators.dialog import render_dialogs

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    turns = _synth_dialog_turns()
    dialogs = df.select(F.col("doc_id").cast("string").alias("doc_id"),
                        turns.alias("turns"))
    return render_dialogs(dialogs).orderBy("doc_id")


def q_ngram_novelty(spark, sf):
    """Per-doc 8-gram novelty vs a reference corpus
    (operators/contamination.py ngram_novelty — the memorization
    scorer).  Texts are synthesized from doc_id arithmetic (12 words,
    stride-997 streams mod 100003 so accidental cross-doc gram overlap
    is impossible); even docs form the reference, odd docs are scored:
    d%10==5 docs copy doc d-5 verbatim (novelty 0), d%10==7 docs copy
    the first 9 words of doc d-7 (2 of 5 grams seen, novelty 0.6),
    other odd docs are fully novel (1.0).  The DuckDB twin re-derives
    the same words and recomputes the gram join with STRING grams —
    counts agree with the engine's xxhash64 grams unless a hash
    collision occurs (none at this scale)."""
    from validr_spark.operators.contamination import ngram_novelty

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    d = F.col("doc_id")

    def word(doc_expr, k):
        return F.concat(F.lit("w"), ((doc_expr * 997 + k) % 100003)
                        .cast("string"))

    words = []
    for k in range(12):
        base = word(d, k)
        w = (F.when((d % 2 == 1) & (d % 10 == 5), word(d - 5, k))
             .when((d % 2 == 1) & (d % 10 == 7) & (k < 9), word(d - 7, k))
             .otherwise(base))
        words.append(w)
    texts = df.select(d.cast("string").alias("doc_id"),
                      F.concat_ws(" ", *words).alias("text"),
                      (d % 2).alias("_par"))
    ref = texts.filter(F.col("_par") == 0).drop("_par")
    ev = texts.filter(F.col("_par") == 1).drop("_par")
    return ngram_novelty(ev, ref, n=8).orderBy("doc_id")


def q_dialog_check(spark, sf):
    """Structural chat-dialog validation (operators/dialog.py
    dialog_violations — the SFT-data QC gate: role enum, system
    placement, user/assistant alternation, empty contents, final-turn
    role) over dialogs synthesized deterministically from documents with
    one injected defect class per modulus (mutually exclusive via
    first-match-wins), so every expected violation row — rule_id,
    position, message, value — is a closed-form function of doc_id.  The
    DuckDB twin derives the expected rows from the same injection
    arithmetic (the injected-rows-only armor pattern: no cross-engine
    struct-array semantics in the oracle)."""
    from validr_spark.operators.dialog import dialog_violations

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    turns = _synth_dialog_turns()
    dialogs = df.select(F.col("doc_id").cast("string").alias("doc_id"),
                        turns.alias("turns"))
    return dialog_violations(dialogs).orderBy("doc_id", "rule_id")


def q_split_leakage(spark, sf):
    """Cross-split near-dup leakage (operators/contamination.py
    split_leakage) over a DETERMINISTIC corpus: docs < 100 rewritten to
    one of 7 shared blobs, split by parity (7 odd, so every blob group spans both parities) — every same-blob
    cross-parity pair must surface with jaccard 1.0 (exact dups always
    share all LSH bands, so candidate recall is exact here and the
    DuckDB twin can enumerate the pairs directly)."""
    from validr_spark.operators.contamination import split_leakage
    df = (_load(spark, sf, "documents").filter(F.col("doc_id") < 100)
          .withColumn("text", F.concat(F.lit("leak blob "),
                                       (F.col("doc_id") % 7).cast("string")))
          .withColumn("split", F.when(F.col("doc_id") % 2 == 0, "train")
                      .otherwise(F.lit("test"))))
    return (split_leakage(df, threshold=0.8)
            .select("id_a", "id_b", "split_a", "split_b",
                    F.round("score", 6).alias("score")))


def q_source_overlap(spark, sf):
    """Cross-source duplication matrix (operators/dedup.py
    source_overlap) over documents with deterministic cross-source
    duplication injected (docs with doc_id%10<2 share text across
    sources via a modular rewrite both engines perform identically)."""
    from validr_spark.operators.dedup import source_overlap
    df = _load(spark, sf, "documents")
    # inject overlap: every doc_id%10<2 row replaces its text with a
    # shared blob keyed by doc_id%7 (same rule in the oracle)
    shared = F.concat(F.lit("shared blob "),
                      (F.col("doc_id") % 7).cast("string"))
    df = df.withColumn(
        "text", F.when(F.col("doc_id") % 10 < 2, shared)
        .otherwise(F.col("text")))
    return source_overlap(df)


def q_fuzzy_ref(spark, sf):
    """Typo-tolerant referential check (operators/referential.py
    fuzzy_orphans, deletion-neighborhood equi-join): sources corrupted
    deterministically (doc_id%13 appends a char, %17 becomes garbage)
    against the clean source dimension — near-misses get the suggested
    correction, true orphans don't.  DuckDB verifies by brute-force
    levenshtein over the small dimension."""
    from validr_spark.operators.referential import fuzzy_orphans
    df = _load(spark, sf, "documents")
    corrupted = df.withColumn(
        "source",
        F.when(F.col("doc_id") % 13 == 0, F.concat("source", F.lit("x")))
        .when(F.col("doc_id") % 17 == 0, F.lit("zzz"))
        .otherwise(F.col("source")))
    dim = df.select("source").distinct()
    return fuzzy_orphans(corrupted, dim, "source")


def q_upsample(spark, sf):
    """Deterministic epoch upsampling (operators/sampling.py
    upsample_epochs): src0 at 2.5 epochs, src1 at 0.4, everything else
    kept once; output = per-(source, epoch) row counts.  DuckDB rebuilds
    the same epoch explosion and md5 tail thresholds (0.5*2^32 =
    '80000000', 0.4*2^32 = '66666666')."""
    from validr_spark.operators.sampling import upsample_epochs
    df = _load(spark, sf, "documents")
    up = upsample_epochs(df, {"src0": 2.5, "src1": 0.4},
                         source_col="source", key="doc_id")
    return (up.groupBy("source", "epoch")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("source", "epoch"))


def q_psi_quantile(spark, sf):
    """Equal-frequency PSI (operators/drift.py psi_quantile, exact
    percentile mode == DuckDB quantile_cont): documents n_chars, all
    sources as reference vs the English slice as "new"."""
    from validr_spark.operators.drift import psi_quantile
    docs = _load(spark, sf, "documents")
    ref = docs
    new = docs.filter(F.col("lang") == "en")
    return psi_quantile(ref, new, "n_chars", bins=10, exact=True).select(
        F.round("psi", 6).alias("psi"), "n_bins")


def q_temperature_mix(spark, sf):
    """Temperature-smoothed source mixture (operators/sampling.py
    temperature_weights) at alpha=0.5 over per-source character mass with
    a 10M-char budget prescription.  alpha=0.5 rides IEEE-exact sqrt on
    both engines (pow is ±1 ulp engine-specific — would flake the hash)."""
    from validr_spark.operators.sampling import temperature_weights
    df = _load(spark, sf, "documents")
    return temperature_weights(df, by="source", weight_col="n_chars",
                               alpha=0.5, total_budget=10_000_000)


def q_join_fanout(spark, sf):
    """Join-fanout pre-flight (operators/skew.py join_fanout_report):
    estimated output blow-up of joining all events against click events
    on user_id — per-key side counts, output product, top-15 by product.
    DuckDB recomputes the same per-key arithmetic."""
    from validr_spark.operators.skew import join_fanout_report
    ev = _load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    return join_fanout_report(ev, clicks, on="user_id", k=15)


def q_nfc_audit(spark, sf):
    """Unicode normalization-form audit (operators/encoding.py nfc_audit)
    over a FULLY SYNTHETIC text column with DETERMINISTIC non-NFC
    injection: doc_id%5==0 gets a decomposed e+U+0301 suffix (non-ASCII,
    not NFC), %5==1 a precomposed U+00E9 (non-ASCII, NFC), the rest pure
    ASCII.  Both engines build identical controlled strings, so DuckDB's
    nfc_normalize only ever sees the two known literals — no corpus- or
    version-dependent Unicode behavior in the hash (round-3 armoring of
    a CORRECTNESS_r02 hash-FAIL).  The not-NFC fraction ships as an
    integer ppm (floor-division both sides) instead of a rounded double
    — DuckDB round() half-way semantics changed across versions."""
    from validr_spark.operators.encoding import nfc_audit
    df = _load(spark, sf, "documents")
    d = F.col("doc_id")
    base = F.concat(F.lit("line "), (d % 17).cast("string"))
    inj = (F.when(d % 5 == 0,
                  F.concat(base, F.lit(" e\u0301")))  # decomposed: not NFC
           .when(d % 5 == 1,
                 F.concat(base, F.lit(" \u00e9")))  # precomposed: NFC
           .otherwise(base))
    audit = nfc_audit(df.select("source", "doc_id")
                      .withColumn("text", inj), by="source")
    return audit.select(
        "source", "n_docs", "n_non_ascii", "n_not_nfc",
        F.expr("(1000000 * n_not_nfc) div n_docs").alias("not_nfc_ppm"))


def q_collocations(spark, sf):
    """Corpus-level PMI collocations (operators/textstats.py
    collocations): top-40 adjacent word pairs by count with independence
    lift — deterministic (count, w1, w2) ordering so the oracled columns
    are pure integer/ratio arithmetic (pmi's log2 is pytest-checked
    instead; last-ulp log differences across engines would flake a hash)."""
    from validr_spark.operators.textstats import collocations
    df = _load(spark, sf, "documents")
    return (collocations(df, min_count=5)
            .select("w1", "w2", "pair_count", "w1_count", "w2_count",
                    F.round("lift", 6).alias("lift"))
            .orderBy(F.desc("pair_count"), "w1", "w2").limit(40))


def q_edit_sim(spark, sf):
    """Exact normalized edit-distance verifier (operators/dedup.py
    edit_distance_verify) over a DETERMINISTIC candidate set (all doc
    pairs with ids < 40, max_len 600) — the order-sensitive twin of
    jaccard_exact; both Spark and DuckDB run their built-in levenshtein
    over identically normalized/truncated text."""
    df = _load(spark, sf, "documents").filter(F.col("doc_id") < 40)
    a = df.select(F.col("doc_id").alias("id_a"))
    b = df.select(F.col("doc_id").alias("id_b"))
    cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (dedup.edit_distance_verify(df, cand, threshold=0.05,
                                       max_len=600)
            .select("id_a", "id_b",
                    F.round("edit_sim", 6).alias("edit_sim"),
                    F.col("truncated").cast("int").alias("truncated"))
            .orderBy("id_a", "id_b"))


def q_containment(spark, sf):
    """Asymmetric containment verifier (operators/dedup.py
    containment_verify) over the same deterministic pair set as
    jaccard_exact — |A∩B|/|A| and /|B| over distinct word-3-gram sets;
    DuckDB recomputes from distinct string grams."""
    df = _load(spark, sf, "documents").filter(F.col("doc_id") < 60)
    a = df.select(F.col("doc_id").alias("id_a"))
    b = df.select(F.col("doc_id").alias("id_b"))
    cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (dedup.containment_verify(df, cand, ngram=3, threshold=0.01)
            .select("id_a", "id_b",
                    F.round("containment_a", 6).alias("containment_a"),
                    F.round("containment_b", 6).alias("containment_b"),
                    F.round("max_containment", 6).alias("max_containment"))
            .orderBy("id_a", "id_b"))


def q_token_budget(spark, sf):
    """Deterministic budgeted corpus cut (operators/packing.py
    take_weight_budget): the first documents in md5(seed|doc_id) order
    whose cumulative n_chars stays within a 20,000-char budget.  DuckDB
    recomputes the same md5 order and running sum."""
    from validr_spark.operators.packing import take_weight_budget
    df = _load(spark, sf, "documents")
    kept = take_weight_budget(df, 20_000, F.col("n_chars"))
    return kept.select("doc_id", "n_chars").orderBy("doc_id")


def q_train_order(spark, sf):
    """Deterministic global training shuffle (operators/sampling.py
    training_order): every document gets a (shard, pos) reading order
    from md5(42|doc_id) — rerun-identical, per-shard windows only.
    DuckDB recomputes the shard assignment and in-shard row_number."""
    from validr_spark.operators.sampling import training_order
    df = _load(spark, sf, "documents")
    return (training_order(df, "doc_id", shards=16)
            .select("doc_id", "shard", "pos").orderBy("doc_id"))


def q_budget_mix(spark, sf):
    """Per-source budget mixture cut (operators/packing.py
    take_grouped_budgets): fixed n_chars budgets for three sources,
    everything else dropped.  DuckDB recomputes the per-source md5-order
    running sums."""
    from validr_spark.operators.packing import take_grouped_budgets
    df = _load(spark, sf, "documents")
    kept = take_grouped_budgets(
        df, {"src0": 3000, "src1": 2000, "src2": 1000}, F.col("n_chars"))
    return kept.select("doc_id", "source", "n_chars").orderBy("doc_id")


def q_ccnet_mix(spark, sf):
    """CCNet perplexity-bucket selection (operators/textstats.py
    ccnet_sample): even-doc_id documents scored under the odd-half unigram
    model, bucketed at fixed logprob cutoffs (head/middle/tail), kept at
    per-bucket md5 rates (1.0 / 0.5 / 0.1).  DuckDB rebuilds the model,
    the buckets, and the md5 thresholds; hash-matching the kept doc_ids
    pins scoring + bucketing + selection end-to-end."""
    from validr_spark.operators.textstats import ccnet_sample
    df = _load(spark, sf, "documents").filter(F.col("text").isNotNull())
    even = df.filter(F.col("doc_id") % 2 == 0)
    odd = df.filter(F.col("doc_id") % 2 == 1)
    kept = ccnet_sample(even, cutoffs=[-4.91, -4.92], rates={0: 1.0, 1: 0.5},
                        ref=odd, default_rate=0.1)
    return (kept.select("doc_id", "bucket", "avg_logprob")
            .orderBy("doc_id"))


def q_dsir_select(spark, sf):
    """DSIR importance resampling (operators/dsir.py, Xie et al. 2023):
    weight every document toward the lang='en' slice under add-0.5
    smoothed shared-vocab unigram models, then Gumbel-top-50 resample
    (md5-seeded, deterministic).  DuckDB rebuilds both models, the
    smoothing, and the Gumbel keys from the same md5."""
    from validr_spark.operators.dsir import dsir_select
    docs = _load(spark, sf, "documents").filter(F.col("text").isNotNull())
    target = docs.filter(F.col("lang") == "en")
    return (dsir_select(docs, target, k=50, temperature=0.2)
            .orderBy(F.desc("sample_key"), "doc_id"))


def q_multimodal_features(spark, sf):
    """Media feature extraction over synthesized binary blobs.
    Rows-only: the input is binary media generated in-session (not a
    pre-registered view) and decoding is a pandas-UDF; the header-parse
    algebra on real bytes is hash-oracled separately as image_audit."""
    from validr_spark.operators.multimodal import (extract_features,
                                                   make_fake_media)

    media = make_fake_media(spark, 200)
    feats = extract_features(media, decoder="fake")
    return (feats.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("n_bytes"), 2).alias("avg_bytes"))
            .orderBy("kind"))


def q_image_audit(spark, sf):
    """Image-header audit (operators/multimodal.py image_audit): PNG
    dimensions parsed from binary headers entirely in codegen (hex/conv
    on byte slices — no codec, no Python).  Hash-oracled (upgraded from
    rows-only in round 3): make_fake_media's blobs are a deterministic
    function of the row id, so DuckDB REBUILDS the same bytes with
    unhex() and re-parses the fixed offsets from the hex rendering —
    a genuine independent header parse, not an arithmetic shortcut.
    Every 10th image row is decapitated (first 16 bytes dropped) on both
    sides to exercise the bad_header path."""
    from validr_spark.operators.multimodal import image_audit, make_fake_media
    media = make_fake_media(spark, 300)
    rid = F.substring("media_id", 3, 6).cast("int")
    corrupted = media.withColumn(
        "content",
        F.when((F.col("kind") == "image") & (rid % 10 == 0),
               F.substring(F.col("content"), 17, 1 << 20))
        .otherwise(F.col("content")))
    return image_audit(corrupted)


def q_sample_split(spark, sf):
    """Deterministic train/val/test assignment (operators/sampling.py
    split_assign): md5-hash interval membership, map-side only; the only
    shuffle is the tiny count aggregate below."""
    from validr_spark.operators.sampling import split_assign

    df = _load(spark, sf, "documents")
    return (split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                         key="doc_id")
            .groupBy("split").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("split"))


def q_sample_mix(spark, sf):
    """Per-source keep rates (weighted_mix) + audit (sample_report) —
    the data-mixing step of a pretraining pipeline."""
    from validr_spark.operators.sampling import sample_report, weighted_mix

    df = _load(spark, sf, "documents")
    mixed = weighted_mix(df, {"src0": 1.0, "src1": 0.5, "src2": 0.25},
                         "source", key="doc_id", default_rate=0.1)
    return sample_report(df, mixed, "source").orderBy("source")


def q_pii_audit(spark, sf):
    """PII scan (operators/pii.py) over documents with deterministic
    synthetic PII injected per doc_id residue class — the corpus itself is
    PII-free word soup, so the injection makes every regex class fire and
    the oracle checks real per-row counts, not 0==0."""
    from validr_spark.operators.pii import pii_scan

    doc = _load(spark, sf, "documents")
    did = F.col("doc_id")
    h = F.md5(did.cast("string"))
    uuid = F.concat_ws("-", F.substring(h, 1, 8), F.substring(h, 9, 4),
                       F.substring(h, 13, 4), F.substring(h, 17, 4),
                       F.substring(h, 21, 12))

    def seg(m, c):
        return F.when(did % m == 0, c).otherwise(F.lit(""))

    enriched = F.concat(
        F.col("text"),
        seg(7, F.concat(F.lit(" mail user"), did.cast("string"),
                        F.lit("@example.com ok"))),
        seg(11, F.concat(F.lit(" ip 10."), (did % 200).cast("string"),
                         F.lit(".0.1 seen"))),
        seg(13, F.concat(F.lit(" ssn 123-45-"),
                         F.lpad((did % 10000).cast("string"), 4, "0"),
                         F.lit(" end"))),
        seg(17, F.concat(F.lit(" id "), uuid, F.lit(" here"))),
        seg(19, F.lit(" call +12 345-6789 ok")),
        seg(23, F.lit(" card 4111 1111 1111 1111 x")),
    )
    df = doc.select("doc_id", enriched.alias("text"))
    return pii_scan(df).filter("has_pii").orderBy("doc_id")


def q_repetition_topk(spark, sf):
    """Gopher-style repetition signals (textstats.repetition_features):
    top-10 most word-repetitive docs.  Map-side projection + top-k."""
    df = _load(spark, sf, "documents")
    r = textstats.repetition_features(F.col("text"))
    return (df.select("doc_id", r.alias("r"))
            .select("doc_id", F.col("r.n_lines").alias("n_lines"),
                    F.round("r.dup_line_fraction", 6)
                    .alias("dup_line_fraction"),
                    F.round("r.dup_word_fraction", 6)
                    .alias("dup_word_fraction"))
            .orderBy(F.desc("dup_word_fraction"), "doc_id").limit(10))


def q_top_ngram(spark, sf):
    """Per-language top-bigram share (textstats.top_ngram_stats): the
    Gopher repetition rule's n-gram mode, aggregated per lang."""
    df = _load(spark, sf, "documents")
    tg = textstats.top_ngram_stats(df, n=2, carry_cols=["lang"])
    return (tg.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("top_ngram_fraction"), 6)
                 .alias("avg_top2gram_frac"),
                 F.max("top_ngram_count").alias("max_top2gram_count"))
            .orderBy("lang"))


def q_quality_filter(spark, sf):
    """C4/Gopher keep-drop composite (textstats.quality_filter): per
    reason-set doc counts.  Map-side rule evaluation; the shuffle carries
    one row per distinct reason combination."""
    df = _load(spark, sf, "documents")
    qf = textstats.quality_filter(df)
    return (qf.groupBy("keep", "reasons")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("keep", "reasons"))


def q_pipeline_prep(spark, sf):
    """Composed prep pipeline (validr_spark/pipeline.py
    prepare_training_data): validate → exact dedup → quality filter.
    Near-dup is off here so every stage has an exact SQL twin; the whole
    pipeline stays ONE lazy plan (collect_stats=False — no counting
    jobs), exactly the 100 TB posture."""
    from validr_spark.pipeline import prepare_training_data
    df = _load(spark, sf, "documents")
    res = prepare_training_data(df, documents_schema(), near_dup=False,
                                pack=False, collect_stats=False)
    return res.kept.select("doc_id").orderBy("doc_id")


def q_token_hist(spark, sf):
    """Whitespace-token histogram (drift.token_histogram) over document
    words: top 20 tokens.  Explode → map-side partial agg → top-k."""
    df = _load(spark, sf, "documents")
    toks = df.select(textstats.words_of(F.col("text")).alias("tokens"))
    return (drift.token_histogram(toks)
            .withColumnRenamed("category", "token")
            .orderBy(F.desc("n"), "token").limit(20))


def q_sessions(spark, sf):
    """Gap-based sessionization (operators/temporal.py) over events:
    session-size distribution.  One shuffle on user_id; both windows and
    the rollup share that partitioning."""
    from validr_spark.operators.temporal import session_stats

    ev = _load(spark, sf, "events")
    st = session_stats(ev, gap_seconds=1800)
    return (st.groupBy("n_events")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.round(F.avg("duration_sec"), 6).alias("avg_duration_sec"))
            .orderBy("n_events"))


def q_asof_clicks(spark, sf):
    """As-of join (operators/temporal.py): each error event picks up the
    most recent click by the same user (DuckDB ASOF LEFT JOIN parity,
    inclusive on ties).  Union + key-partitioned window — one shuffle."""
    from validr_spark.operators.temporal import asof_join, epoch_seconds

    ev = _load(spark, sf, "events")
    err = (ev.filter(F.col("event_type") == "error")
           .select("event_id", "user_id", "ts"))
    clk = (ev.filter(F.col("event_type") == "click")
           .select("user_id", "ts", "value"))
    j = asof_join(err, clk, on="user_id", ts_col="ts")
    lag = epoch_seconds(j, "ts") - epoch_seconds(j, "ts_right")
    return j.agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.sum(F.col("ts_right").isNotNull().cast("long")).alias("n_matched"),
        F.round(F.avg(lag), 6).alias("avg_lag_sec"),
        F.round(F.sum("value_right"), 6).alias("sum_click_value"))


def q_asof_forward(spark, sf):
    """Forward as-of join (direction='forward'): each error event picks
    up the NEXT click at-or-after it by the same user — oracled against
    DuckDB's ASOF LEFT JOIN with the inequality reversed (e.ts <= c.ts
    matches the smallest c.ts at-or-after)."""
    from validr_spark.operators.temporal import asof_join, epoch_seconds

    ev = _load(spark, sf, "events")
    err = (ev.filter(F.col("event_type") == "error")
           .select("event_id", "user_id", "ts"))
    clk = (ev.filter(F.col("event_type") == "click")
           .select("user_id", "ts", "value"))
    j = asof_join(err, clk, on="user_id", ts_col="ts",
                  direction="forward")
    lead = epoch_seconds(j, "ts_right") - epoch_seconds(j, "ts")
    return j.agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.sum(F.col("ts_right").isNotNull().cast("long")).alias("n_matched"),
        F.round(F.avg(lead), 6).alias("avg_lead_sec"),
        F.round(F.sum("value_right"), 6).alias("sum_click_value"))


def q_map_validate(spark, sf):
    """Dynamic-dict (MapType) container validation (compiler._map_core):
    a 3-entry map built from document columns goes through the real
    transform_keys/values machinery — key enum + value minlen/maxlen with
    the reference's per-dict fail-fast (first failing entry wins, key
    checked before value).  The oracle reproduces the same fail-fast CASE
    chain on the flat columns."""
    doc = _load(spark, sf, "documents")
    did = F.col("doc_id")
    df = doc.select(
        "doc_id",
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.concat(F.lit("k"), (did % 3).cast("string")),
            F.repeat(F.lit("v"), (1 + did % 5).cast("int")),
        ).alias("props")).withColumn("_id", did)
    schema = T.dict(props=T.dict.key(T.enum(["lang", "source", "k0"]))
                    .value(T.str.minlen(2).maxlen(4)))
    plan = SparkCompiler().compile(schema)
    v = plan.apply(df, id_cols=["_id"]).violations()
    return (v.select(F.col("_id").alias("id"), "rule_id", "position",
                     "message", "value")
            .orderBy("id", "rule_id"))


def q_check_suite(spark, sf):
    """Declarative table-level gate: the whole suite is ONE aggregation
    pass (operators/checks.py).  Message column omitted here: the
    number-to-string rendering differs between engines; the verdict logic
    (observed/lo/hi/passed) is the contract."""
    from validr_spark.operators.checks import Check, CheckSuite
    df = _load(spark, sf, "documents")
    suite = CheckSuite("documents_gate", [
        Check.row_count(min=1),
        Check.null_rate("text", max=0.05, empty_is_null=True),
        Check.min("n_chars", ge=0),
        Check.max("n_chars", le=400),
        Check.mean("n_chars", between=(50.0, 400.0)),
        Check.unique_ratio("doc_id", min=0.999, exact=True),
        Check.values_in("lang", DOC_LANGS, min_ratio=0.95),
        Check.matches("source", r"src\d+", min_ratio=1.0),
        Check.quantile("n_chars", 0.5, between=(100.0, 400.0), exact=True),
        Check.satisfies("n_chars = char_length(text)", min_ratio=1.0,
                        name="n_chars_consistent"),
    ])
    return (suite.run(df, round_digits=4)
            .select("check_id", "column", "observed", "lo", "hi", "passed")
            .orderBy("check_id"))


def q_suggest_schema(spark, sf):
    """Constraint suggestion: profile documents in one agg pass and emit
    the drafted validr element per column (operators/suggest.py).  The
    fixture table has no nulls, so the .optional suffix never fires here
    (optional handling is pytest-covered in tests/test_suggest.py)."""
    from validr_spark.operators.suggest import suggest_elements
    df = _load(spark, sf, "documents")
    els = suggest_elements(df, enum_max=12)
    rows = [(k, v if isinstance(v, str) else str(v))
            for k, v in sorted(els.items())]
    return (spark.createDataFrame(rows, "column string, element string")
            .orderBy("column"))


def q_anomaly_scan(spark, sf):
    """Metric anomaly detection (operators/anomaly.py) over a run history
    derived from events: per (event_type, day) counts play the role of
    per-partition manifest metrics; each day is judged against the
    strictly-preceding days of the same event_type (z-score, frame-bounded
    window — one shuffle on the key)."""
    from validr_spark.operators.anomaly import metric_anomalies
    ev = _load(spark, sf, "events")
    man = (ev.groupBy(F.col("event_type").alias("part"),
                      F.dayofmonth("ts").cast("double").alias("finished_at"))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum((F.col("value") < 0).cast("long")).alias("n_bad_rows"),
                F.sum((F.col("value") > 100).cast("long"))
                .alias("n_violations")))
    return (metric_anomalies(man, threshold=2.0)
            .orderBy("part", "finished_at", "metric"))


def q_contamination(spark, sf):
    """Benchmark decontamination (operators/contamination.py): docs whose
    doc_id % 97 == 0 play the held-out benchmark; every corpus doc is
    scored by distinct shared word-8-grams.  Broadcast gram probe — the
    corpus side is never shuffled (oracle matches on gram STRINGS, which
    equals the xxhash64-key result absent 64-bit collisions)."""
    from validr_spark.operators.contamination import contamination_scan
    df = _load(spark, sf, "documents")
    bench = df.filter(F.col("doc_id") % 97 == 0)
    return (contamination_scan(df, bench, n=8)
            .orderBy("doc_id"))


def q_events_diff(spark, sf):
    """Row-level table diff (operators/diff.py): version A = events minus
    ids ≡ 1 (mod 7); version B = events minus ids ≡ 0 (mod 7) with value
    bumped where id ≡ 0 (mod 5).  Full-outer join on the key, null-safe
    column compare → added/removed/changed/same per row.  changed_cols is
    flattened to a CSV string so the oracle hash is array-free."""
    from validr_spark.operators.diff import table_diff

    ev = _load(spark, sf, "events").select("event_id", "event_type", "value")
    a = ev.filter(F.col("event_id") % 7 != 1)
    b = (ev.filter(F.col("event_id") % 7 != 0)
         .withColumn("value", F.when(F.col("event_id") % 5 == 0,
                                     F.col("value") + 1.0)
                     .otherwise(F.col("value"))))
    d = table_diff(a, b, key_cols=["event_id"])
    return (d.select("event_id", "status",
                     F.array_join("changed_cols", ",").alias("changed"))
            .orderBy("event_id"))


def q_loss_mask(spark, sf):
    """SFT loss-mask spans (operators/dialog.loss_spans) over the SAME
    synthesized dialogs as dialog_check/dialog_render: per-turn content
    character spans in the rendered training text plus the
    assistant-only learn flag.  The DuckDB twin rebuilds the turn lists
    and replays the prefix-sum span algebra generically (unnest +
    window) rather than closed-form, so the offset arithmetic itself is
    differentially verified; render_dialogs' byte-for-byte oracle
    already pins the string the spans index into."""
    from validr_spark.operators.dialog import loss_spans

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    turns = _synth_dialog_turns()
    dialogs = df.select(F.col("doc_id").cast("string").alias("doc_id"),
                        turns.alias("turns"))
    return loss_spans(dialogs).orderBy("doc_id", "turn_idx")


def q_length_buckets(spark, sf):
    """Batch-shape padding-waste planner (operators/packing.
    length_buckets) over documents.n_chars as the sequence length —
    8 near-equal-count buckets from the length histogram, per-bucket
    pad-to-max waste in integer ppm.  The DuckDB twin replays the
    histogram → cumulative → floor-bucket → per-bucket algebra."""
    from validr_spark.operators.packing import length_buckets

    df = _load(spark, sf, "documents")
    return length_buckets(df, num_buckets=8, len_col="n_chars")


def q_template_mining(spark, sf):
    """Boilerplate template detection (operators/textstats.
    template_mining) over deterministic digit-bearing text synthesized
    from documents (two machine-generated shapes + the raw corpus
    text), so normalization (lower, digits → '#', whitespace collapse)
    must collapse each shape into one template.  DuckDB twin runs the
    identical normalization and md5-keyed grouping."""
    from validr_spark.operators.textstats import template_mining

    df = _load(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    d = F.col("doc_id")
    text = (F.when(d % 3 == 0,
                   F.concat(F.lit("Error 404: page "), d.cast("string"),
                            F.lit(" not found")))
            .when(d % 3 == 1,
                  F.concat(F.lit("Item "), (d % 50).cast("string"),
                           F.lit(" - price $"),
                           F.coalesce(F.col("n_chars"), F.lit(0))
                           .cast("string")))
            .otherwise(F.col("text")))
    return template_mining(df.select(text.alias("text")),
                           min_docs=2, top=50)


def q_turn_stats(spark, sf):
    """Per-(source, role) dialog-turn scorecard (operators/dialog.
    turn_stats) over the dialog_check synthetic dialogs with the real
    documents source carried as the group.  DuckDB twin rebuilds the
    turn lists and replays the explode + group-by generically."""
    from validr_spark.operators.dialog import turn_stats

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    turns = _synth_dialog_turns()
    dialogs = df.select(F.col("source"), turns.alias("turns"))
    return (turn_stats(dialogs, group_col="source")
            .orderBy("source", "role"))


def q_context_overflow(spark, sf):
    """Context-length overflow audit (operators/packing.context_overflow)
    over documents.n_chars per source at four candidate context lengths
    — one aggregation pass, per-cutoff rows exploded from the
    group-sized result.  DuckDB twin: the same conditional sums via a
    VALUES cross join."""
    from validr_spark.operators.packing import context_overflow

    df = _load(spark, sf, "documents")
    return (context_overflow(df, cutoffs=(64, 128, 256, 512),
                             len_col="n_chars", group_col="source")
            .orderBy("source", "cutoff"))


def q_pack_stats(spark, sf):
    """SHARDED sequence packing (operators/packing.py): pack documents
    into 1024-token bins (n_chars plays token length) across 8 parallel
    FFD shards, report bin count / utilization.  Hash-oracled (upgraded
    from rows-only in round 4): sharding by ``doc_id % 8`` via the
    shard_col override (the default xxhash64 shard has no DuckDB
    counterpart), so the DuckDB twin replays all 8 greedy walks with one
    RECURSIVE CTE partitioned by shard — the multi-shard complement of
    the single-stream pack_oracle."""
    from validr_spark.operators.packing import pack_greedy, packing_stats

    df = (_load(spark, sf, "documents")
          .withColumn("_shard",
                      F.pmod(F.coalesce(F.col("doc_id"), F.lit(0)),
                             F.lit(8))))
    packed = pack_greedy(df, max_tokens=1024, id_col="doc_id",
                         len_col="n_chars", num_shards=8,
                         shard_col="_shard")
    return packing_stats(packed, max_tokens=1024)


def q_dup_components(spark, sf):
    """Connected components (operators/graph.py) over a deterministic
    edge list: consecutive doc_ids sharing a lang are 'duplicates'.
    Components = maximal same-lang runs; the oracle computes the same
    grouping with gaps-and-islands SQL.  Exercises the full iterative
    min-label propagation loop (multi-round convergence on chains)."""
    from validr_spark.operators.graph import connected_components

    d = (_load(spark, sf, "documents")
         .groupBy("doc_id").agg(F.min("lang").alias("lang")))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"),
                 F.col("lang").alias("lang_b"))
    edges = (d.join(b, ["doc_id"])
             .filter(F.col("lang") == F.col("lang_b"))
             .select(F.col("doc_id").alias("id_a"),
                     (F.col("doc_id") + 1).alias("id_b")))
    cc = connected_components(edges, nodes=d.select("doc_id"), max_iter=60)
    return (cc.select(F.col("id").alias("doc_id"), "component")
            .orderBy("doc_id"))


def q_psi_drift(spark, sf):
    """PSI drift (operators/drift.py): click vs error event values over
    10 equal-width bins of the click (reference) range.  Two scan
    aggregates; shuffle carries <= bins rows."""
    from validr_spark.operators.drift import psi

    ev = _load(spark, sf, "events")
    ref = ev.filter(F.col("event_type") == "click")
    new = ev.filter(F.col("event_type") == "error")
    return psi(ref, new, "value", bins=10).select(
        F.round("psi", 6).alias("psi"), "n_bins")


def q_key_skew(spark, sf):
    """Join-key skew pre-flight (operators/skew.py) on events.user_id —
    one hash aggregate on the key, then a one-row summary."""
    from validr_spark.operators.skew import key_skew_report

    return key_skew_report(_load(spark, sf, "events"), "user_id")


def q_heavy_keys(spark, sf):
    """Top-10 heavy-hitter user_ids (operators/skew.py) — the keys a
    salted repartition would split.  TakeOrderedAndProject."""
    from validr_spark.operators.skew import heavy_hitters

    return (heavy_hitters(_load(spark, sf, "events"), "user_id", k=10)
            .withColumnRenamed("key", "user_id"))


def q_jsd_drift(spark, sf):
    """Jensen–Shannon divergence (operators/drift.py jsd) between the
    event_type distributions of even vs odd event_ids.  Two category
    aggs + a category-sized join; completes the chi²/PSI/KS drift family
    with the bounded symmetric measure."""
    from validr_spark.operators.drift import jsd

    ev = _load(spark, sf, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    return (jsd(a, b, "event_type")
            .select(F.round("jsd", 6).alias("jsd"), "n_categories",
                    "n_ref", "n_new"))


def q_json_props_validate(spark, sf):
    """Semi-structured validation parity: events.props is a JSON string;
    parse it with an all-string-leaf read schema (the validr-faithful
    ingestion convention — sources/tables.validr_read_schema) and let the
    compiled plan do the typed coercion, so JSON ``69`` and ``"69"``
    validate identically (str-accept semantics, reference pyx:763-785).
    Map-side from_json + the usual one-projection validate.

    The repartition exists because the sf0.1 events file scans as ~2
    splits while the Jackson parse is the CPU cost — 2 of 32 cores did
    all the work (measured 4-6 s; ~1 s after spreading).  At production
    scale the input has enough splits and the exchange is unnecessary —
    a 100k-row shuffle here is the honest small-file fix, not a crutch
    the real plan needs."""
    ev = _load(spark, sf, "events")
    par = spark.sparkContext.defaultParallelism * 2
    # nondeterministic guard (PERF.md Finding 4): without it
    # CollapseProject inlines the from_json into EVERY rule reference of
    # k in the compiled projection and Jackson parses each row ~6 times
    # (measured, with the repartition spread: 4.5 s → 0.67 s at sf0.1)
    p_once = F.when(F.monotonically_increasing_id() >= 0,
                    F.from_json("props", "k string"))
    df = (ev.repartition(par)
          .select("event_id", p_once.alias("_p"))
          .select(F.col("event_id").alias("_id"),
                  F.col("_p.k").alias("k")))
    plan = SparkCompiler().compile(T.dict(k=T.int.min(10).max(80)))
    v = plan.apply(df, id_cols=["_id"]).violations()
    return (v.select(F.col("_id").alias("event_id"), "rule_id", "value")
            .orderBy("event_id", "rule_id"))


def q_fd_check(spark, sf):
    """Functional-dependency check (operators/consistency.py
    fd_violations): does doc_id % 100 determine lang?  (It doesn't — the
    violating buckets and a bounded sorted sample of their conflicting
    langs come back.)  Dedup agg + per-key window over deduped pairs;
    group state bounded by sample_values."""
    from validr_spark.operators.consistency import fd_violations

    doc = (_load(spark, sf, "documents")
           .withColumn("k", F.col("doc_id") % 100))
    # '|'-join the sampled array: the driver's canonicalizer cannot
    # sort/hash list cells (same crash class as r2's value_variants)
    return (fd_violations(doc, "k", "lang", sample_values=3)
            .withColumn("values", F.array_join("values", "|"))
            .orderBy("k"))


def q_ordering_check(spark, sf):
    """Per-key monotonicity check (operators/consistency.py
    ordering_violations): event ts must not regress per user in event_id
    (arrival) order.  The synthetic events are already monotone, so a
    deterministic 6-hour clock rollback is injected at event_id % 31 —
    the check must recover exactly those regressions.  One window shuffle
    on user_id; O(1) lag state."""
    from validr_spark.operators.consistency import ordering_violations

    ev = _load(spark, sf, "events")
    shifted = ev.withColumn(
        "ts", F.when(F.col("event_id") % 31 == 0,
                     F.col("ts") - F.expr("INTERVAL 6 HOURS"))
        .otherwise(F.col("ts")))
    return (ordering_violations(shifted, "user_id", "ts", "event_id")
            .orderBy("user_id", "event_id").limit(500))


def q_encoding_audit(spark, sf):
    """Encoding-hygiene report (operators/encoding.py) per source over
    documents with deterministic decode artifacts injected per doc_id
    residue class (the corpus itself is clean UTF-8 word soup): a U+FFFD
    replacement char, a BEL control char, a Latin-1+cp1252 mojibake pair,
    a zero-width space.  Pure codegen regexp_count, map-side scan + one
    |sources|-row aggregate; the IDENTICAL pattern strings run in the
    DuckDB oracle (Java ∩ RE2 dialect, \\x{hhhh} escapes)."""
    from validr_spark.operators.encoding import encoding_report

    doc = _load(spark, sf, "documents")
    did = F.col("doc_id")

    def seg(m, s):
        return F.when(did % m == 0, F.lit(s)).otherwise(F.lit(""))

    text = F.concat(
        F.col("text"),
        seg(7, " lost � byte"),
        seg(11, " bell \x07 char"),
        seg(13, " moji Ã© and â€™ quote"),
        seg(17, " zw ​ here"))
    return encoding_report(doc.select(text.alias("text"), "source"),
                           by="source")


def q_robust_outliers(spark, sf):
    """Robust MAD outlier flags (operators/stats.py mad_outliers) on
    events.value per event_type, summarized per type.  exact=True so the
    Spark `percentile` aggregate matches DuckDB quantile_cont bit-for-bit
    at this scale; the default percentile_approx sketch is the 10^12-row
    path (bounded-memory, mergeable).  Data rows reach the flags via two
    broadcast joins — no row-shaped shuffle."""
    from validr_spark.operators.stats import mad_outliers

    ev = _load(spark, sf, "events")
    out = mad_outliers(ev, "value", by="event_type", k=3.5, exact=True)
    return (out.groupBy("event_type")
            .agg(F.count("value").alias("n"),
                 F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
                 F.round(F.max(F.abs(F.col("robust_z"))), 6)
                 .alias("max_abs_z"))
            .orderBy("event_type"))


def q_embedding_audit(spark, sf):
    """Embedding hygiene audit (operators/embedding.py embedding_hygiene)
    with deterministic corruption injected per vec_id residue class — NaN
    / +Inf / NULL element / truncated dim / all-zero / NULL vector; the
    clean majority passes through.  One map-side projection + a one-row
    aggregate; counts are exact integers on both sides."""
    from validr_spark.operators.embedding import embedding_hygiene

    df = _load(spark, sf, "embeddings")
    e, vid = F.col("embedding"), F.col("vec_id")
    fnan = F.lit(float("nan")).cast("float")
    finf = F.lit(float("inf")).cast("float")
    fnull = F.lit(None).cast("float")
    corrupted = (
        F.when(vid % 89 == 0, F.concat(F.array(fnan), F.slice(e, 2, 63)))
        .when(vid % 97 == 0, F.concat(F.array(finf), F.slice(e, 2, 63)))
        .when(vid % 101 == 0, F.concat(F.array(fnull), F.slice(e, 2, 63)))
        .when(vid % 103 == 0, F.slice(e, 1, 63))
        .when(vid % 107 == 0, F.array_repeat(F.lit(0.0).cast("float"), 64))
        .when(vid % 109 == 0, F.lit(None).cast("array<float>"))
        .otherwise(e))
    return embedding_hygiene(
        df.select(vid, corrupted.alias("embedding")), dim=64)


def q_kmeans_clusters(spark, sf):
    """Distributed spherical k-means (operators/clustering.py) over the
    embeddings table: fit 8 centroids (2 Lloyd's iterations — broadcast
    assign + mapInPandas partial sums, only k x dim floats reach the
    driver), then report the cluster-size histogram.  Hash-oracled
    (upgraded from rows-only in round 3): the fit is seeded with the
    first 8 embeddings by vec_id (SQL-recomputable, unlike the xxhash
    sample), so DuckDB replays the identical unrolled Lloyd's updates —
    assignment margins (~1e-2) dwarf cross-engine summation-order ulps
    (~1e-15), so the integer histogram is stable."""
    from validr_spark.operators.clustering import cluster_sizes, kmeans_fit

    df = _load(spark, sf, "embeddings")
    init = [r["embedding"] for r in
            df.filter(F.col("vec_id") < 8)
            .orderBy("vec_id").select("embedding").collect()]
    cents, _hist = kmeans_fit(df, k=8, iters=2, seed=42, init=init)
    return cluster_sizes(df, cents).orderBy("cluster")


def q_semantic_dups(spark, sf):
    """SemDeDup-shaped semantic near-dup pairs
    (operators/clustering.semantic_dedup_pairs): k-means cells cap the
    all-pairs comparison at sum(|cell|^2); within-cell unrolled-codegen
    cosine >= threshold.  Hash-oracled (upgraded from rows-only in round
    4): the fit is seeded with the first 8 embeddings by vec_id (the
    kmeans_clusters trick), so DuckDB replays the 2 Lloyd iterations,
    the final cell assignment, AND the within-cell pair scan — the full
    SemDeDup recipe end-to-end."""
    from validr_spark.operators.clustering import (kmeans_fit,
                                                   semantic_dedup_pairs)

    df = _load(spark, sf, "embeddings")
    # the synthetic embeddings have no natural near-dups (max pairwise
    # cosine ~0.51), so inject exact duplicates of every 50th vector
    # under shifted ids — the expected output is exactly those pairs
    dup = (df.filter(F.col("vec_id") % 50 == 0)
           .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                   "embedding", "label"))
    u = df.unionByName(dup)
    init = [r["embedding"] for r in
            u.filter(F.col("vec_id") < 8)
            .orderBy("vec_id").select("embedding").collect()]
    cents, _ = kmeans_fit(u, k=8, iters=2, seed=42, init=init)
    return (semantic_dedup_pairs(u, centroids=cents, threshold=0.999)
            .orderBy("id_a", "id_b"))


def q_frame_check(spark, sf):
    """Token-frame integrity (operators/sequences.frame_violations) —
    BOS/EOS placement, trailing-only padding — over synthetic sequences
    derived deterministically from documents (BOS=1, EOS=2, PAD=0;
    defects injected by doc_id arithmetic: %11 drops BOS, %7 drops EOS,
    %13 plants an interior pad, %3 varies the trailing pad run).  The
    DuckDB twin re-derives the same arrays with list concatenation and
    re-implements the framing algebra over the same comma-string
    rendering (same RE2-safe anchored regex)."""
    from validr_spark.operators.sequences import frame_violations

    df = _load(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())

    def arr(*xs):
        return F.array(*[F.lit(x).cast("int") for x in xs])

    empty = F.array().cast("array<int>")
    d = F.col("doc_id")
    b1 = (d % 97 + 10).cast("int")
    b2 = (F.col("n_chars") % 89 + 10).cast("int")
    toks = F.concat(
        F.when(d % 11 == 0, empty).otherwise(arr(1)),
        F.array(b1),
        F.when(d % 13 == 0, arr(0)).otherwise(empty),
        F.array(b2),
        F.when(d % 7 == 0, empty).otherwise(arr(2)),
        F.when(d % 3 == 1, arr(0)).when(d % 3 == 2, arr(0, 0))
         .otherwise(empty))
    seq = df.select("doc_id", toks.alias("tokens"))
    return frame_violations(seq, bos=1, eos=2, pad=0)


def q_sampled_audit(spark, sf):
    """Sampled validation audit (operators/audit.py): validate the
    deterministic 25% md5-threshold sample of documents against the
    n_chars/lang rules and report per-rule violation rates with Wilson
    95% bounds plus the corpus scale-up estimate.  The DuckDB twin runs
    the identical md5 filter, rule set, and interval algebra."""
    from validr_spark.operators.audit import sampled_violation_rates

    df = _load(spark, sf, "documents")
    plan = SparkCompiler().compile(T.dict(
        n_chars=T.int.min(50).max(400), lang=T.enum(DOC_LANGS)))
    return sampled_violation_rates(df, plan, fraction=0.25,
                                   id_cols=["doc_id"])


def q_knn_join(spark, sf):
    """Batch k-NN similarity join (operators/similarity.knn_join):
    exact per-query top-5 corpus neighbors by cosine for query vectors
    vec_id < 3 — broadcast queries, unrolled-codegen dots, partial
    per-query top-k (WindowGroupLimit).  DuckDB twin: same dot algebra
    + QUALIFY row_number per query."""
    from validr_spark.operators.similarity import knn_join

    emb = _load(spark, sf, "embeddings")
    out = knn_join(emb.filter(F.col("vec_id") >= 3),
                   emb.filter(F.col("vec_id") < 3), k=5)
    return out.select("query_id", "vec_id",
                      F.round("cosine", 6).alias("cosine"), "rank") \
        .orderBy("query_id", "rank")


def q_sequences_oracle(spark, sf):
    """Hash-checked CORRECTNESS row for the NORTH-STAR operator
    (operators/sequences.sequence_violations — the two-pass codegen fast
    path): sequences derived deterministically from documents with
    injected defects (out-of-range token %13, negative token %17,
    over-long list %19 — including the %247 overlap that exercises the
    fail-fast 'element error beats tokens.maxlen' rule — n_tok=0 %23,
    plus the naturally-present src18/src19 enum violations).  The DuckDB
    twin re-derives the same arrays and violation algebra in SQL."""
    from validr_spark.operators.sequences import sequence_violations

    df = _load(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
    d = F.col("doc_id")

    def arr(*xs):
        return F.array(*[F.lit(x).cast("int") for x in xs])

    empty = F.array().cast("array<int>")
    b1 = (d % 97 + 10).cast("int")
    b2 = (F.col("n_chars") % 89 + 10).cast("int")
    toks = F.concat(
        F.array(b1, b2),
        F.when(d % 13 == 0, arr(1005)).otherwise(empty),   # > vocab-1
        F.when((d % 13 != 0) & (d % 17 == 0), arr(-3))
         .otherwise(empty),                                # < 0
        F.when(d % 19 == 0, arr(11, 12, 13)).otherwise(empty))  # force >4
    seq = df.select(
        d.cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.when(d % 23 == 0, F.lit(0)).otherwise(F.size(toks))
         .cast("int").alias("n_tok"),
        F.col("source"))
    v = sequence_violations(seq, vocab=1000, maxlen=4,
                            sources=DOC_SOURCES, id_col="doc_id",
                            max_id_len=64, max_n_tok=4)
    return v.orderBy("doc_id", "rule_id")


def q_decontaminated(spark, sf):
    """Benchmark-decontamination REMOVAL transform (operators/
    contamination.decontaminate): per-source doc counts after dropping
    docs sharing ≥2 distinct word-8-grams with the held-out set
    (doc_id % 97 == 0 plays the benchmark, as in q_contamination).
    DuckDB twin rebuilds the gram overlap on strings and anti-joins."""
    from validr_spark.operators.contamination import decontaminate

    df = _load(spark, sf, "documents")
    bench = df.filter(F.col("doc_id") % 97 == 0)
    clean = decontaminate(df, bench, n=8, min_hits=2)
    return (clean.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("source"))


def q_pack_oracle(spark, sf):
    """Packing-algebra oracle: pack_greedy with num_shards=1 is a single
    deterministic FFD stream ((n_tok desc, id asc) order, next-fit bin
    close, oversized docs in own truncated bins) — exactly reproducible
    as a DuckDB RECURSIVE walk.  Hash-checks the packer's bin algebra;
    the sharded scale shape stays covered by pack_stats (rows-only) and
    the pytest invariants."""
    from validr_spark.operators.packing import pack_greedy, packing_stats

    df = _load(spark, sf, "documents")
    packed = pack_greedy(df, max_tokens=1024, id_col="doc_id",
                         len_col="n_chars", num_shards=1)
    return packing_stats(packed, max_tokens=1024)


def q_w1_drift(spark, sf):
    """Wasserstein-1 drift (operators/drift.wasserstein1, exact-percentile
    mode) between click and view event values — the area-between-CDFs
    companion to ks_drift.  DuckDB twin: quantile_cont grids zipped via
    positional unnest."""
    from validr_spark.operators.drift import wasserstein1

    ev = _load(spark, sf, "events")
    # the operator returns the RAW metric (gate contract); the ORACLE
    # projection rounds to 6, matching the DuckDB twin
    return (wasserstein1(ev.filter(F.col("event_type") == "click"),
                         ev.filter(F.col("event_type") == "view"),
                         "value", grid=20, exact=True)
            .select(F.round("w1", 6).alias("w1"), "n_a", "n_b"))


def q_compression_stats(spark, sf):
    """zlib compression-ratio QC (operators/compress.py) per source over
    documents — pandas-UDF (no SQL twin possible: DuckDB has no zlib);
    rows-only check, per-value parity pinned by tests/test_compress.py
    against direct zlib."""
    from validr_spark.operators.compress import compression_report

    return compression_report(_load(spark, sf, "documents"))


def q_violation_triage(spark, sf):
    """Violation triage (operators/audit.violation_triage): top-3
    offending values per rule over the full documents validation, with
    per-rule shares — the "what is actually breaking" report.  The
    DuckDB twin reuses the validate_documents rule CTE and ranks with a
    window + QUALIFY."""
    from validr_spark.operators.audit import violation_triage

    df = _load(spark, sf, "documents")
    plan = SparkCompiler().compile(documents_schema())
    return violation_triage(plan.apply(df, id_cols=["doc_id"]).violations(),
                            k=3)


def _synth_urls(spark, sf):
    """documents + a deterministic `url` column exercising every parser
    branch: www subdomain, port, multi-label public suffix + query
    string, userinfo, uppercase scheme/host, raw IPv4, and an
    unparsable string (doc_id %7 picks the shape, %13 the corrupt
    rows).  The DuckDB twins derive the registrable domain INDEPENDENTLY
    from the same arithmetic — they never run the URL regex."""
    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    d = F.col("doc_id")
    i = d.cast("string")
    url = (
        F.when(d % 7 == 0, F.concat(F.lit("https://www.example.com/d/"), i))
        .when(d % 7 == 1, F.concat(F.lit("https://news-site.org:8080/a/"), i))
        .when(d % 7 == 2, F.concat(F.lit("https://media.bbc.co.uk/c?id="), i))
        .when(d % 7 == 3, F.concat(F.lit("http://u:p@spam-mill.net/x/"), i))
        .when(d % 7 == 4, F.concat(F.lit("HTTPS://Sub.Example.COM/"), i))
        .when(d % 7 == 5, F.concat(F.lit("http://10.1.2.3/"), i))
        .when(d % 13 == 0, F.lit("not-a-url"))
        .otherwise(F.concat(F.lit("https://shop.co.jp/i/"), i)))
    return df.select("doc_id", "n_chars", url.alias("url"))


def q_domain_audit(spark, sf):
    """Registrable-domain histogram with a blocklist flag
    (operators/urlhygiene.domain_histogram): per-domain doc counts and
    corpus shares over synthesized URLs covering subdomains, ports,
    userinfo, a co.uk/co.jp multi-label suffix, an IPv4 host, and
    unparsable rows (NULL-domain bucket).  The twin rebuilds the counts
    from the synthesis arithmetic — an independent derivation that never
    touches the URL regex."""
    from validr_spark.operators.urlhygiene import domain_histogram

    return (domain_histogram(_synth_urls(spark, sf),
                             blocklist=["spam-mill.net"])
            .orderBy(F.col("domain").asc_nulls_first()))


def q_domain_cap(spark, sf):
    """Per-domain contribution cap (operators/urlhygiene.cap_per_domain):
    keep at most 25 docs per registrable domain, best n_chars first
    (doc_id tie-break) — the RefinedWeb-style "no single site dominates"
    rule.  One window shuffle; WindowGroupLimit pushes a partial
    per-domain top-25 into each scan task.  Twin: same cap as a QUALIFY
    row_number over the independently derived domain."""
    from validr_spark.operators.urlhygiene import cap_per_domain

    out = cap_per_domain(_synth_urls(spark, sf), cap=25, by="n_chars")
    return out.select("doc_id").orderBy("doc_id")


def q_chunk_text(spark, sf):
    """Word-window document chunking (operators/chunking.chunk_text):
    split documents into <=40-word windows with 8 words of overlap —
    the pre-packing split for docs longer than the context window.
    Per-chunk rows carry the window arithmetic (index, count, length)
    plus an md5 of the re-joined chunk text; the DuckDB twin rebuilds
    the same sliding windows with list_slice over the split word list."""
    from validr_spark.operators.chunking import chunk_text

    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    out = chunk_text(df.select("doc_id", "text"), max_words=40, overlap=8)
    return (out.select(
                "doc_id", "chunk_index", "n_chunks", "n_words",
                F.md5(F.col("text")).alias("chunk_md5"))
            .orderBy("doc_id", "chunk_index"))


def q_chunk_tokens(spark, sf):
    """Token-window chunking (operators/chunking.chunk_documents) over
    deterministically synthesized token arrays (length 1..123 from
    doc_id/n_chars arithmetic, so multi-chunk docs are guaranteed):
    16-token windows, 4-token overlap — the stride/slice algebra the
    packer relies on to never truncate.  Twin re-derives the arrays with
    range/list_transform and windows them with list_slice."""
    from validr_spark.operators.chunking import chunk_documents

    df = _load(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
    d, nc = F.col("doc_id"), F.col("n_chars")
    ln = (F.abs(d) % 83 + F.abs(nc) % 41 + 1).cast("int")
    toks = F.transform(F.sequence(F.lit(1), ln),
                       lambda x: ((d * 31 + x * 7) % 997).cast("int"))
    seq = df.select(d.alias("doc_id"), toks.alias("tokens"))
    out = chunk_documents(seq, max_tokens=16, overlap=4)
    return (out.select(
                "doc_id", "chunk_index", "n_chunks", "n_tok",
                F.md5(F.array_join(F.col("tokens").cast("array<string>"),
                                   ",")).alias("chunk_md5"))
            .orderBy("doc_id", "chunk_index"))


def q_bm25(spark, sf):
    """BM25 top-10 for a fixed keyword query over documents.text
    (operators/retrieval.bm25_topk) — Okapi scoring with Lucene's
    non-negative idf, rank on the UNROUNDED score (score desc, doc_id
    tie-break), score rounded to 6 on both sides.  Twin: DuckDB
    unnest/groupBy reproduction of the same formula."""
    from validr_spark.operators.retrieval import bm25_topk

    df = _load(spark, sf, "documents")
    return (bm25_topk(df, "hash join merge", k=10)
            .select("doc_id", F.round(F.col("score"), 6).alias("score"),
                    "rank")
            .orderBy("rank"))


def q_numeric_corr(spark, sf):
    """Pairwise Pearson correlations over lineitem's numeric columns
    (operators/stats.numeric_correlations) — Deequ's Correlation
    analyzer shape, all 6 pairs in ONE aggregation pass.  corr is
    rounded to 6 (O(1) magnitude, reduction-order noise ~1e-12);
    covariance stays pytest-only (its 1e6 magnitude makes fixed-decimal
    rounding unstable across engines).  Twin: DuckDB corr per pair."""
    from validr_spark.operators.stats import numeric_correlations

    df = _load(spark, sf, "lineitem")
    out = numeric_correlations(
        df, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        round_to=6)
    return out.select("col_a", "col_b", "corr").orderBy("col_a", "col_b")


# ---------------------------------------------------------------------------
# true merge-based BPE (operators/bpe.py) — round-5 north-rule closure
# ---------------------------------------------------------------------------

# Trained ONCE with operators.bpe.learn_bpe(num_merges=48) on the sf0.01
# documents corpus and PINNED literally, so every scale factor and both
# engines replay the identical table (the r4 pinnable-override pattern:
# training itself is deterministic but sf-dependent; the applied table
# must not be).  Rank = list index.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector")]
# the training corpus's character inventory, pinned with the merges
BPE_ALPHABET = "abcdefghijklmnopqrstuvwy"


def _bpe_vocab() -> dict[str, int]:
    from validr_spark.operators.bpe import bpe_vocab
    return bpe_vocab(BPE_MERGES, list(BPE_ALPHABET))


def q_bpe_tokens(spark, sf):
    """True BPE application (operators/bpe.py): tokenize the first 120
    chars of every document under the pinned 48-merge table, exploded
    to (doc_id, pos, token_id) rows.  The DuckDB twin replays the
    greedy merge loop with a recursive CTE — one merge step per
    recursion level, lowest-rank pair first, leftmost occurrence per
    step, which is provably step-equivalent to the all-occurrences
    GPT-2 loop for any TRAINED table (training creates a symbol before
    any pair containing it; equivalence asserted in tests/test_bpe.py).
    Unknown pieces map to -1 on both sides."""
    from validr_spark.operators.bpe import apply_bpe

    df = (_load(spark, sf, "documents")
          .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
          .select("doc_id", F.substring("text", 1, 120).alias("text")))
    toks = apply_bpe(df, BPE_MERGES, vocab=_bpe_vocab())
    return (toks.select(
        "doc_id", F.posexplode("tokens").alias("pos", "token_id"))
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                F.col("pos").cast("long").alias("pos"),
                F.col("token_id").cast("long").alias("token_id"))
        .orderBy("doc_id", "pos"))


def q_bpe_check(spark, sf):
    """The north-rule invariant end-to-end: tokens_match_tokenizer
    (operators/bpe.py) over a tokens column that is BPE(text) for most
    docs but corrupted (one appended token id 9999) where
    pmod(doc_id, 13) == 0 — exactly the corrupted docs must surface as
    violation rows with the first-divergence index in ``value``.  The
    twin recomputes per-doc token counts with the same recursive CTE
    and emits the identical (id, rule_id, position, message, value)
    strings."""
    from validr_spark.operators.bpe import apply_bpe, tokens_match_tokenizer

    df = (_load(spark, sf, "documents")
          .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
          .select("doc_id", F.substring("text", 1, 120).alias("text")))
    vocab = _bpe_vocab()
    good = apply_bpe(df, BPE_MERGES, vocab=vocab)
    tampered = good.withColumn(
        "tokens",
        F.when(F.pmod(F.col("doc_id"), F.lit(13)) == 0,
               F.concat("tokens", F.array(F.lit(9999))))
        .otherwise(F.col("tokens")))
    return (tokens_match_tokenizer(tampered, BPE_MERGES, vocab=vocab)
            .select(F.col("id").cast("long").alias("id"),
                    "rule_id", "position", "message", "value")
            .orderBy("id"))


def q_bpe_coverage(spark, sf):
    """Per-source unknown-piece coverage of a TRUNCATED BPE vocab (ids
    < 40 kept, the rest dropped so the -1 unk path is exercised with
    real hits) — the vocab-acceptance report for subword ids, the BPE
    complement of vocab_coverage's word-vocab OOV report.  One guarded
    Arrow pass + explode + per-source hash agg; the twin reuses the
    recursive merge CTE and filters the id table the same way."""
    from validr_spark.operators.bpe import apply_bpe

    vocab40 = {t: i for t, i in _bpe_vocab().items() if i < 40}
    df = (_load(spark, sf, "documents")
          .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
          .select("doc_id", F.col("source"),
                  F.substring("text", 1, 120).alias("text")))
    toks = apply_bpe(df, BPE_MERGES, vocab=vocab40)
    ex = toks.select("source", F.explode("tokens").alias("tid"))
    return (ex.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum((F.col("tid") == -1).cast("long")).alias("n_unk"),
                 F.round(F.sum((F.col("tid") == -1).cast("long"))
                         / F.count(F.lit(1)), 6).alias("unk_rate"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# language identification (operators/langid.py) — round-5
# ---------------------------------------------------------------------------

# Pinned trilingual training templates: the model is TRAINED in-query
# (train_lang_model, round_to=8 pins the float boundary) and the DuckDB
# twin replays the training math too — counts, the shared smoothing
# vocabulary V, ln((c+1)/(tot+V)) — so the whole train→score→predict
# path is hash-verified, not just scoring.  All-lowercase ASCII so the
# lower() step and char indexing cannot diverge between engines.
LANG_TEMPLATES = {
    "en": "the quick brown fox jumps over the lazy dog and runs far "
          "away today",
    "de": "der schnelle braune fuchs springt ueber den faulen hund und "
          "lief heute weg",
    "fr": "le renard brun rapide saute par dessus le chien paresseux "
          "et court loin",
}


def _lang_model(spark):
    from validr_spark.operators.langid import train_lang_model
    df = spark.createDataFrame(
        [(t, l) for l, t in sorted(LANG_TEMPLATES.items())],
        "text string, lang string")
    return train_lang_model(df, n=3, alpha=1.0, round_to=8)


def _lang_docs(spark, sf):
    """Deterministic synthetic trilingual corpus keyed off doc_id:
    template by pmod(doc_id,3), sliced at a pmod(doc_id,7) offset for
    per-doc gram variety."""
    df = _load(spark, sf, "documents").filter(F.col("doc_id").isNotNull())
    tpl = (F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0,
                  F.lit(LANG_TEMPLATES["en"]))
           .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1,
                 F.lit(LANG_TEMPLATES["de"]))
           .otherwise(F.lit(LANG_TEMPLATES["fr"])))
    txt = F.substr(tpl, F.pmod(F.col("doc_id"), F.lit(7)) + F.lit(1),
                   F.lit(60))
    return df.select("doc_id", txt.alias("text"))


def q_lang_scores(spark, sf):
    """Char-trigram Naive-Bayes language scores (operators/langid.py)
    over the synthetic trilingual corpus: one (id, lang, score,
    n_grams) row per doc × language, model trained in-query on the
    pinned templates.  Scoring is zero-Python codegen (gram posexplode
    + broadcast model join + two hash aggs); the twin replays training
    AND scoring in SQL."""
    from validr_spark.operators.langid import lang_scores

    out = lang_scores(_lang_docs(spark, sf), _lang_model(spark),
                      round_to=6)
    return (out.select(F.col("id").cast("long").alias("id"), "lang",
                       "score", F.col("n_grams").cast("long")
                       .alias("n_grams"))
            .orderBy("id", "lang"))


def q_lang_predict(spark, sf):
    """Argmax + top-two-margin prediction (langid.lang_predict) over
    the same scores — the lang_filter gate's inputs.  Deterministic
    tie-break (score desc, lang asc) replayed by the twin's window."""
    from validr_spark.operators.langid import lang_predict, lang_scores

    pred = lang_predict(lang_scores(_lang_docs(spark, sf),
                                    _lang_model(spark), round_to=6))
    return (pred.select(F.col("id").cast("long").alias("id"), "lang",
                        "score", F.round("margin", 6).alias("margin"))
            .orderBy("id"))




# ---------------------------------------------------------------------------
# unigram-LM tokenizer (operators/unigram.py) — round-5
# ---------------------------------------------------------------------------

# Trained ONCE with operators.unigram.train_unigram (max_piece_len=4 so
# real multi-piece segmentations occur, em_iters=5, round_to=8) on the
# sf0.01 documents word counts and PINNED; tests/test_unigram.py
# verifies the table is TIE-FREE over every corpus word and every
# prefix (any substr cut), so Viterbi's argmax and the oracle's
# exhaustive-lattice argmax agree independent of tie rules.
UNIGRAM_VOCAB: dict[str, float] = {
    'a': -3.8311024, 'ab': -51.53376106, 'abl': -36.12940789,
    'able': -17.73118928, 'ag': -29.89447876, 'agg': -3.81376252,
    'al': -42.6391927, 'all': -13.99351512, 'alu': -37.95458685,
    'alue': -19.55636825, 'am': -4.86908812, 'an': -78.29030866,
    'ar': -44.49443733, 'ark': -13.53307478, 'art': -30.10177937,
    'as': -55.02641431, 'ash': -29.73559025, 'ast': -92.55032501,
    'at': -31.24820115, 'ata': -64.46901472, 'atc': -31.02253318,
    'atch': -5.05087748, 'b': -5.03041048, 'ba': -5.1916069,
    'bat': -5.34573826, 'batc': -5.10277983, 'bi': -29.92258237,
    'big': -3.84186613, 'bl': -38.49832043, 'ble': -20.10010183,
    'c': -26.46602449, 'ca': -88.13630441, 'can': -24.25390659,
    'ch': -5.34565979, 'co': -4.86419382, 'col': -4.8654129,
    'colu': -4.89990699, 'ct': -32.62614369, 'cto': -42.8178869,
    'ctor': -11.72693638, 'cu': -27.73428149, 'cus': -34.7016756,
    'cust': -3.77775578, 'd': -21.80012009, 'da': -38.49831925,
    'dat': -24.52499428, 'data': -3.80598784, 'de': -35.70276703,
    'der': -4.61181651, 'do': -74.74360839, 'dow': -5.02027901,
    'du': -33.62132949, 'dup': -7.35913574, 'e': -2.69416947,
    'ea': -38.08339185, 'eam': -4.99394957, 'ec': -45.89336133,
    'ect': -37.93871493, 'ecto': -48.13045815, 'er': -3.34032642,
    'erg': -36.88448392, 'erge': -18.48626531, 'ery': -5.17981563,
    'ey': -35.14457574, 'f': -42.42281845, 'fa': -28.93113555,
    'fas': -36.19071989, 'fast': -3.86730102, 'fi': -12.07635247,
    'fil': -11.99156885, 'filt': -3.77934746, 'g': -5.01102674,
    'ge': -19.09811034, 'gg': -24.53276896, 'gr': -5.35746793,
    'gro': -5.38788467, 'grou': -5.19293082, 'h': -5.10276423,
    'ha': -43.87640884, 'has': -29.73559025, 'hash': -3.76393455,
    'he': -36.20725059, 'i': -47.68330894, 'ig': -29.76161948,
    'il': -100.67459284, 'ilt': -92.46237145, 'ilte': -102.87595433,
    'in': -44.80331963, 'ind': -74.49141747, 'indo': -119.24302975,
    'ine': -34.0392376, 'j': -112.65038581, 'jo': -93.09252066,
    'joi': -67.62853875, 'join': -3.74614092, 'k': -14.57047258,
    'ke': -30.06461033, 'key': -3.81929411, 'l': -12.61683541,
    'le': -20.20462257, 'li': -77.79336304, 'lin': -22.20200623,
    'line': -3.80378763, 'll': -14.0347855, 'lo': -93.9966578,
    'low': -24.27332842, 'lt': -32.7539781, 'lte': -43.16756098,
    'lter': -12.07661045, 'lu': -27.64592506, 'lue': -20.43130701,
    'lum': -68.74683933, 'lumn': -4.86444151, 'm': -13.8611257,
    'ma': -34.53530726, 'mal': -34.01978051, 'mall': -3.78433054,
    'me': -20.1754351, 'mer': -15.82872362, 'merg': -3.79504164,
    'mn': -4.89990698, 'n': -26.58699479, 'nd': -29.99253327,
    'ndo': -74.74414555, 'ndow': -5.02081616, 'ne': -115.50158817,
    'o': -15.34436363, 'oi': -205.94188489, 'oin': -142.05948706,
    'ol': -67.57320313, 'olu': -67.60769721, 'olum': -106.53125039,
    'om': -24.45512346, 'ome': -34.86870634, 'omer': -3.77775582,
    'or': -3.43413934, 'ord': -4.38997684, 'orde': -14.80355972,
    'ort': -24.32473724, 'ou': -31.6194574, 'oup': -5.35726365,
    'ow': -4.76789079, 'p': -5.19277728, 'pa': -33.52162025,
    'par': -31.79333018, 'park': -3.8374122, 'part': -3.83958562,
    'q': -5.46384464, 'qu': -5.07866894, 'que': -5.23289157,
    'quer': -5.19800473, 'r': -10.82419905, 'rd': -37.85125934,
    'rde': -48.26484222, 'rder': -17.1738917, 're': -29.99995313,
    'rea': -38.01106709, 'ream': -4.92162481, 'rg': -38.34058813,
    'rge': -19.94236953, 'rk': -14.61409196, 'ro': -29.72765176,
    'rou': -31.27364707, 'roup': -5.01145332, 'row': -3.76823488,
    'rt': -42.84894075, 'ry': -5.16113042, 's': -3.11727795,
    'sc': -80.25220229, 'sca': -67.65801457, 'scan': -3.77561674,
    'sh': -44.44684259, 'sl': -28.76675568, 'slo': -73.51836796,
    'slow': -3.79503857, 'sm': -13.98191684, 'sma': -14.05701742,
    'smal': -13.54149066, 'so': -60.06683677, 'sor': -36.16986626,
    'sort': -3.8464474, 'sp': -14.50978698, 'spa': -14.67377198,
    'spar': -14.68440398, 'st': -4.92184546, 'sto': -84.20296974,
    'stom': -71.17905009, 'str': -4.92314247, 'stre': -4.9361186,
    't': -12.51268366, 'ta': -20.22550572, 'tab': -19.21034219,
    'tabl': -3.80598902, 'tc': -31.13980458, 'tch': -5.16814888,
    'te': -43.08771839, 'ter': -11.99676787, 'th': -22.28205033,
    'the': -3.88383173, 'to': -41.44778867, 'tom': -73.14483663,
    'tome': -83.55841951, 'tor': -11.76163235, 'tr': -25.40143232,
    'tre': -25.41440844, 'trea': -33.42552241, 'u': -24.36482196,
    'ue': -16.55673855, 'uer': -31.70917568, 'uery': -5.46385945,
    'um': -68.74756281, 'umn': -4.86516498, 'up': -5.38784673,
    'us': -97.40946583, 'ust': -66.485546, 'usto': -79.61281875,
    'v': -17.51441855, 'va': -20.47574902, 'val': -20.17602591,
    'valu': -3.81817664, 've': -11.7296005, 'vec': -11.75695112,
    'vect': -3.80230472, 'w': -35.51480003, 'wi': -5.02081616,
    'win': -5.020279, 'wind': -4.76808808, 'y': -5.16209212
}
UNIGRAM_MAX_PIECE = 4


def q_unigram_tokens(spark, sf):
    """Unigram-LM (SentencePiece-family) tokenization
    (operators/unigram.py): Viterbi-best segmentation of the first 120
    chars of every document under the pinned 228-piece model, exploded
    to (doc_id, pos, token_id).  The DuckDB twin enumerates EVERY
    segmentation of each distinct word with a recursive path CTE and
    arg_max-picks the best — exhaustive replay is exact because the
    pinned table is verified tie-free, and per-path float sums are
    left-to-right on both sides."""
    from validr_spark.operators.unigram import apply_unigram, unigram_ids

    df = (_load(spark, sf, "documents")
          .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
          .select("doc_id", F.substring("text", 1, 120).alias("text")))
    toks = apply_unigram(df, UNIGRAM_VOCAB,
                         max_piece_len=UNIGRAM_MAX_PIECE,
                         ids=unigram_ids(UNIGRAM_VOCAB))
    return (toks.select(
        "doc_id", F.posexplode("tokens").alias("pos", "token_id"))
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                F.col("pos").cast("long").alias("pos"),
                F.col("token_id").cast("long").alias("token_id"))
        .orderBy("doc_id", "pos"))


def q_unigram_check(spark, sf):
    """tokens_match_unigram end-to-end (operators/unigram.py): a
    tokens column that is unigram(text) for most docs but corrupted
    (one appended 9999) where pmod(doc_id, 11) == 0 — exactly those
    docs must surface with the first-divergence index, mirroring
    bpe_check for the second tokenizer family.  The twin reuses the
    exhaustive-lattice CTE for per-doc counts and matches the message
    strings byte-for-byte."""
    from validr_spark.operators.unigram import (apply_unigram,
                                                tokens_match_unigram,
                                                unigram_ids)

    ids = unigram_ids(UNIGRAM_VOCAB)
    df = (_load(spark, sf, "documents")
          .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
          .select("doc_id", F.substring("text", 1, 120).alias("text")))
    good = apply_unigram(df, UNIGRAM_VOCAB,
                         max_piece_len=UNIGRAM_MAX_PIECE, ids=ids)
    tampered = good.withColumn(
        "tokens",
        F.when(F.pmod(F.col("doc_id"), F.lit(11)) == 0,
               F.concat("tokens", F.array(F.lit(9999))))
        .otherwise(F.col("tokens")))
    return (tokens_match_unigram(tampered, UNIGRAM_VOCAB,
                                 max_piece_len=UNIGRAM_MAX_PIECE,
                                 ids=ids)
            .select(F.col("id").cast("long").alias("id"),
                    "rule_id", "position", "message", "value")
            .orderBy("id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # ------------------------------------------------------------------
        # Ordering is DELIBERATE (rotated round-5): the correctness driver
        # samples a prefix of this dict.  The four round-5 queries lead
        # (never driver-checked), then the VERDICT-r4 rotation ask: the
        # longest-unverified round-1/2 greens (sessions, events_diff,
        # psi_drift, key_skew, the streaming-adjacent and skew rows --
        # none re-checked since r1/r2) and the round-2/3 lineage rows the
        # r04 sample missed, plus two never-sampled rows-only entries.
        # 46 of the 50 prefix slots were NOT in r04's sample.  Proven r3/
        # r4 greens rotate to the back: the driver re-verifies whatever
        # it samples, so they lose nothing by moving.
        # ------------------------------------------------------------------
        "bpe_tokens": q_bpe_tokens,
        "bpe_check": q_bpe_check,
        "bpe_coverage": q_bpe_coverage,
        "unigram_tokens": q_unigram_tokens,
        "unigram_check": q_unigram_check,
        "lang_scores": q_lang_scores,
        "lang_predict": q_lang_predict,
        # longest-unverified round-1/2 driver-greens (not re-checked
        # since r1/r2 -- the r5 rotation ask):
        "sessions": q_sessions,
        "events_diff": q_events_diff,
        "psi_drift": q_psi_drift,
        "key_skew": q_key_skew,
        "heavy_keys": q_heavy_keys,
        "encoding_audit": q_encoding_audit,
        "fd_check": q_fd_check,
        "ordering_check": q_ordering_check,
        "jsd_drift": q_jsd_drift,
        "robust_outliers": q_robust_outliers,
        "embedding_audit": q_embedding_audit,
        "span_cut": q_span_cut,
        "jaccard_exact": q_jaccard_exact,
        "containment": q_containment,
        "edit_sim": q_edit_sim,
        "collocations": q_collocations,
        "join_fanout": q_join_fanout,
        "resample_daily": q_resample,
        "temperature_mix": q_temperature_mix,
        "upsample": q_upsample,
        "fuzzy_ref": q_fuzzy_ref,
        "source_overlap": q_source_overlap,
        "split_leakage": q_split_leakage,
        "psi_groups": q_psi_groups,
        "token_counts": q_token_counts,
        "lang_hist": q_lang_hist,
        "ann_topk": q_ann_topk,
        "embedding_stats": q_embedding_stats,
        "events_validate": q_events_validate,
        "doc_profile": q_doc_profile,
        "chars_quantiles": q_chars_quantiles,
        "orphan_rows": q_orphan_rows,
        "dup_keys_salted": q_dup_keys_salted,
        # round-2/3 lineage rows that were NOT in the r04 sample:
        "dsir_select": q_dsir_select,
        "ccnet_mix": q_ccnet_mix,
        "token_budget": q_token_budget,
        "budget_mix": q_budget_mix,
        "train_order": q_train_order,
        "pipeline_prep": q_pipeline_prep,
        "token_hist": q_token_hist,
        # rows-only entries never yet driver-sampled (the weaker
        # rows-only check is still a first signal):
        "sequences_validate": q_sequences_validate,
        "manifest_run": q_manifest_run,
        # upgraded rows-only -> hash-oracle this round (never hash-checked):
        "ngram_jaccard": q_ngram_jaccard,
        # ---- end of the 50-slot driver sampling prefix ----
        "quality_filter": q_quality_filter,
        "top_ngram": q_top_ngram,
        "repetition_topk": q_repetition_topk,
        # round-3 greens (many re-verified by the r4 judge session):
        "scalar_net_violations": q_scalar_net_violations,
        "scalar_net_coerced": q_scalar_net_coerced,
        "scalar_temporal": q_scalar_temporal,
        "scalar_strnum": q_scalar_strnum,
        "sequences_oracle": q_sequences_oracle,
        "pack_oracle": q_pack_oracle,
        "check_suite": q_check_suite,
        "frame_check": q_frame_check,
        "json_props_validate": q_json_props_validate,
        "repair_report": q_repair_report,
        "minhash_oracle": q_minhash_oracle,
        "simhash_oracle": q_simhash_oracle,
        "image_audit": q_image_audit,
        "kmeans_clusters": q_kmeans_clusters,
        "map_validate": q_map_validate,
        "suggest_schema": q_suggest_schema,
        "sample_split": q_sample_split,
        "sample_mix": q_sample_mix,
        "pii_audit": q_pii_audit,
        "violation_triage": q_violation_triage,
        "asof_clicks": q_asof_clicks,
        "asof_forward": q_asof_forward,
        "anomaly_scan": q_anomaly_scan,
        "dup_components": q_dup_components,
        "contamination": q_contamination,
        "decontaminated": q_decontaminated,
        "knn_join": q_knn_join,
        "bm25_topk": q_bm25,
        "vocab": q_vocab,
        "psi_quantile": q_psi_quantile,
        "table_fp": q_table_fp,
        # round-4 driver-greens (proven newest -- rotate to the back):
        "turn_stats": q_turn_stats,
        "context_overflow": q_context_overflow,
        "loss_mask": q_loss_mask,
        "length_buckets": q_length_buckets,
        "template_mining": q_template_mining,
        "token_repetition": q_token_repetition,
        "dialog_check": q_dialog_check,
        "ngram_novelty": q_ngram_novelty,
        "dialog_render": q_dialog_render,
        "preference_check": q_preference_check,
        "dedup_sequences": q_dedup_sequences,
        "token_contamination": q_token_contamination,
        "pipeline_seq": q_pipeline_seq,
        "sampled_audit": q_sampled_audit,
        "w1_drift": q_w1_drift,
        "domain_audit": q_domain_audit,
        "domain_cap": q_domain_cap,
        "chunk_text": q_chunk_text,
        "chunk_tokens": q_chunk_tokens,
        "numeric_corr": q_numeric_corr,
        "semantic_dups": q_semantic_dups,
        "ivf_topk": q_ivf_topk,
        "pack_stats": q_pack_stats,
        "nfc_audit": q_nfc_audit,
        "clean_text": q_clean_text,
        "position_stats": q_position_stats,
        "vocab_coverage": q_vocab_coverage,
        "value_variants": q_value_variants,
        "doc_null_rate": q_doc_null_rate,
        "doc_length_stats": q_doc_length_stats,
        "unique_doc_id": q_unique_doc_id,
        "ref_orphans": q_ref_orphans,
        "lineitem_violations": q_lineitem_violations,
        "validate_documents": _validate_documents_viol,
        "tpch_q1": q_tpch_q1,
        "events_chi2": q_events_chi2,
        "ks_drift": q_ks_drift,
        "dedup_prefix": q_dedup_prefix,
        "dedup_keep": q_dedup_keep,
        "dedup_best": q_dedup_best,
        "incremental_new": q_incremental_new,
        "tokenized_stats": q_tokenized_stats,
        "para_dedup": q_para_dedup,
        "emb_drift": q_emb_drift,
        "dup_spans": q_dup_spans,
        "doc_entropy": q_doc_entropy,
        "src_entropy": q_src_entropy,
        "doc_logprob": q_doc_logprob,
        "text_profile": q_text_profile,
        # rows-only (no SQL oracle)
        "compression_stats": q_compression_stats,
        "file_layout": q_file_layout,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_topk": q_lsh_topk,
        "multimodal_features": q_multimodal_features,
    }


def _doc_viol_cte(doc_src_list: str, lang_expects: str, src_expects: str,
                  clip: str) -> str:
    """Shared CTE body producing the documents violation rows
    (id, rule_id, position, message, value) — used verbatim by the
    validate_documents oracle and as the input of violation_triage."""
    return f"""v AS (
              SELECT doc_id AS id,
                CASE WHEN doc_id < 0 THEN 'doc_id.min' END AS r_doc,
                CASE WHEN text IS NULL OR text = '' THEN 'text.required'
                     WHEN length(text) < 100 THEN 'text.minlen'
                     WHEN length(text) > 2000 THEN 'text.maxlen' END AS r_text,
                CASE WHEN lang NOT IN ('en','de','fr','es') THEN 'lang.enum' END AS r_lang,
                CASE WHEN source NOT IN ({doc_src_list}) THEN 'source.enum' END AS r_src,
                CASE WHEN n_chars < 50 THEN 'n_chars.min'
                     WHEN n_chars > 400 THEN 'n_chars.max' END AS r_nc,
                text, lang, source, n_chars, doc_id
              FROM documents
            ),
            viol AS (
            SELECT id, r_doc AS rule_id, 'doc_id' AS position,
                   'value must >= 0' AS message, doc_id::VARCHAR AS value
              FROM v WHERE r_doc IS NOT NULL
            UNION ALL
            SELECT id, r_text, 'text',
                   CASE r_text WHEN 'text.required' THEN 'required'
                        WHEN 'text.minlen' THEN 'string length must >= 100'
                        ELSE 'string length must <= 2000' END,
                   {clip.format(c='text')}
              FROM v WHERE r_text IS NOT NULL
            UNION ALL
            SELECT id, r_lang, 'lang',
                   'expect one of {lang_expects}',
                   '''' || lang || ''''
              FROM v WHERE r_lang IS NOT NULL
            UNION ALL
            SELECT id, r_src, 'source',
                   'expect one of {src_expects}',
                   '''' || source || ''''
              FROM v WHERE r_src IS NOT NULL
            UNION ALL
            SELECT id, r_nc, 'n_chars',
                   CASE r_nc WHEN 'n_chars.min' THEN 'value must >= 50'
                        ELSE 'value must <= 400' END,
                   n_chars::VARCHAR
              FROM v WHERE r_nc IS NOT NULL
            )"""


def _bpe_bestpos(sym: str) -> str:
    """Scalar subquery: position of the leftmost occurrence of the
    lowest-rank mergeable pair in symbol list ``sym`` (NULL when no
    adjacent pair is in the merge table).  (rank, position) is encoded
    as rank*1000+position — words are capped at 120 chars upstream, so
    position < 1000 and the decode is exact."""
    return (f"(SELECT CAST(min(mm.rank * 1000 + p.i) % 1000 AS BIGINT) "
            f"FROM (SELECT unnest({sym}[1:len({sym})-1]) AS a, "
            f"unnest({sym}[2:len({sym})]) AS b, "
            f"unnest(range(1, len({sym}))) AS i) p "
            f"JOIN m mm ON mm.l = p.a AND mm.r = p.b)")


def _bpe_cte() -> str:
    """Shared recursive-CTE body replaying the pinned BPE merge table
    (single-leftmost-occurrence-per-step — step-equivalent to the
    engine's all-occurrences loop for trained tables, see
    tests/test_bpe.py): documents → per-word symbol lists → iterated
    merges → ``fin(doc_id, widx, syms)`` terminal states, plus the
    merge-rank table ``m`` and id table ``v``."""
    merges_values = ", ".join(f"('{l}', '{r}', {i})"
                              for i, (l, r) in enumerate(BPE_MERGES))
    vocab_values = ", ".join(f"('{t}', {i})"
                             for t, i in _bpe_vocab().items())
    return f"""
            m(l, r, rank) AS (VALUES {merges_values}),
            v(tok, tid) AS (VALUES {vocab_values}),
            words AS (
              SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                     unnest(ws) AS word
              FROM (SELECT doc_id,
                           regexp_extract_all(substr(text, 1, 120),
                               '[^ \\t\\n\\r\\f\\x0B]+') AS ws
                    FROM documents
                    WHERE text IS NOT NULL AND doc_id IS NOT NULL) s),
            init AS (
              SELECT doc_id, widx,
                     regexp_extract_all(word, '.', 0) AS syms
              FROM words),
            bpe(doc_id, widx, syms, bp) AS (
              SELECT doc_id, widx, syms, {_bpe_bestpos('syms')}
              FROM init
              UNION ALL
              SELECT doc_id, widx, ns, {_bpe_bestpos('ns')}
              FROM (SELECT doc_id, widx,
                           syms[1:bp-1] || [syms[bp] || syms[bp+1]]
                               || syms[bp+2:] AS ns
                    FROM bpe WHERE bp IS NOT NULL) t),
            fin AS (SELECT doc_id, widx, syms FROM bpe WHERE bp IS NULL)"""


def _langid_cte() -> str:
    """Shared CTE body replaying langid TRAINING (per-lang trigram
    counts, shared smoothing vocabulary V, ln((c+1)/(tot+V)) rounded
    to the same 8-decimal pin) and SCORING (gram explode → model join
    → NB log-sum with floor backoff) over the synthetic trilingual
    corpus — ends at ``scores(id, lang, score, n_grams)``."""
    en, de, fr = (LANG_TEMPLATES["en"], LANG_TEMPLATES["de"],
                  LANG_TEMPLATES["fr"])
    return f"""
            tpl(lang, txt) AS (
              VALUES ('de', '{de}'), ('en', '{en}'), ('fr', '{fr}')),
            tg AS (
              SELECT lang, substr(txt, CAST(i AS INT), 3) AS gram
              FROM tpl, unnest(range(1, length(txt) - 1)) AS t(i)),
            counts AS (
              SELECT lang, gram, count(*) AS c
              FROM tg GROUP BY lang, gram),
            vs AS (SELECT count(DISTINCT gram) AS v FROM counts),
            tot AS (SELECT lang, sum(c) AS tot FROM counts GROUP BY lang),
            m AS (
              SELECT c.lang, c.gram,
                     round(ln((c.c + 1.0) / (t.tot + 1.0 * v.v)), 8)
                       AS logp
              FROM counts c JOIN tot t USING (lang) CROSS JOIN vs v),
            fl AS (
              SELECT t.lang,
                     round(ln(1.0 / (t.tot + 1.0 * v.v)), 8)
                       AS floor_logp
              FROM tot t CROSS JOIN vs v),
            docs AS (
              SELECT doc_id AS id,
                     substr(CASE ((doc_id % 3) + 3) % 3
                              WHEN 0 THEN '{en}'
                              WHEN 1 THEN '{de}'
                              ELSE '{fr}' END,
                            CAST(((doc_id % 7) + 7) % 7 + 1 AS INT),
                            60) AS txt
              FROM documents WHERE doc_id IS NOT NULL),
            g AS (
              SELECT id, substr(txt, CAST(i AS INT), 3) AS gram
              FROM docs, unnest(range(1, length(txt) - 1)) AS t(i)),
            per_doc AS (
              SELECT id, count(*) AS n_grams FROM g GROUP BY id),
            present AS (
              SELECT g.id, m.lang, sum(m.logp) AS ps, count(*) AS pc
              FROM g JOIN m ON m.gram = g.gram GROUP BY g.id, m.lang),
            scores AS (
              SELECT d.id, f.lang,
                     round(coalesce(p.ps, 0.0)
                           + (d.n_grams - coalesce(p.pc, 0))
                             * f.floor_logp, 6) AS score,
                     CAST(d.n_grams AS BIGINT) AS n_grams
              FROM per_doc d CROSS JOIN fl f
              LEFT JOIN present p ON p.id = d.id AND p.lang = f.lang)"""


def _unigram_cte() -> str:
    """Shared CTE chain for the unigram twins: pinned piece table
    ``u(piece, lp, tid)``, word instances, exhaustive segmentation
    paths per DISTINCT word (recursive), tie-free arg_max best path,
    and ``toks(doc_id, widx, si, piece)``."""
    from validr_spark.operators.unigram import unigram_ids

    ids = unigram_ids(UNIGRAM_VOCAB)
    vals = ", ".join(f"('{s}', {lp!r}, {ids[s]})"
                     for s, lp in sorted(UNIGRAM_VOCAB.items()))
    return f"""
            u(piece, lp, tid) AS (VALUES {vals}),
            words AS (
              SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                     unnest(ws) AS word
              FROM (SELECT doc_id,
                           regexp_extract_all(substr(text, 1, 120),
                               '[^ \\t\\n\\r\\f\\x0B]+') AS ws
                    FROM documents
                    WHERE text IS NOT NULL AND doc_id IS NOT NULL) s),
            dw AS (SELECT DISTINCT word FROM words),
            paths(word, pos, score, path) AS (
              SELECT word, 0, CAST(0 AS DOUBLE),
                     CAST([] AS VARCHAR[]) FROM dw
              UNION ALL
              SELECT p.word, p.pos + len(u.piece), p.score + u.lp,
                     p.path || [u.piece]
              FROM paths p
              JOIN u ON u.piece
                        = substr(p.word, p.pos + 1, len(u.piece))
              WHERE p.pos < len(p.word)),
            best AS (
              SELECT word, arg_max(path, score) AS path
              FROM paths WHERE pos = len(word) GROUP BY word),
            toks AS (
              SELECT w.doc_id, w.widx,
                     generate_subscripts(b.path, 1) AS si,
                     unnest(b.path) AS piece
              FROM words w JOIN best b USING (word))"""


def _unigram_oracle_sql() -> str:
    """DuckDB twin of q_unigram_tokens: exhaustive segmentation paths
    per DISTINCT word via a recursive CTE over the pinned piece table
    (piece, logp, id), arg_max over the (tie-free, verified) per-path
    left-to-right float sums, joined back to word instances."""
    return f"""
            WITH RECURSIVE {_unigram_cte()},
            out AS (
              SELECT t.doc_id,
                     row_number() OVER (PARTITION BY t.doc_id
                                        ORDER BY t.widx, t.si) - 1
                       AS pos,
                     uu.tid AS token_id
              FROM toks t JOIN u uu ON uu.piece = t.piece)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(token_id AS BIGINT) AS token_id
            FROM out ORDER BY doc_id, pos
        """


def _unigram_check_oracle_sql() -> str:
    """DuckDB twin of q_unigram_check: per-doc token counts from the
    same best paths; docs with pmod(doc_id,11)==0 carry one appended
    token, so expected n / got n+1, first divergence at index n."""
    return f"""
            WITH RECURSIVE {_unigram_cte()},
            cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                    FROM toks GROUP BY doc_id),
            docs AS (SELECT doc_id FROM documents
                     WHERE text IS NOT NULL AND doc_id IS NOT NULL),
            n_by_doc AS (SELECT d.doc_id, coalesce(c.n, 0) AS n
                         FROM docs d LEFT JOIN cnt c USING (doc_id))
            SELECT CAST(doc_id AS BIGINT) AS id,
                   'tokens.unigram_mismatch' AS rule_id,
                   'tokens' AS position,
                   'tokens != unigram(text): expected '
                     || CAST(n AS VARCHAR) || ' tokens, got '
                     || CAST(n + 1 AS VARCHAR) AS message,
                   CAST(n AS VARCHAR) AS value
            FROM n_by_doc
            WHERE ((doc_id % 11) + 11) % 11 = 0
            ORDER BY id
        """


def oracle_sql() -> dict[str, str]:
    # single quotes inside SQL string literals must be doubled
    lang_expects = _enum_expects(DOC_LANGS).replace("'", "''")
    src_expects = _enum_expects(DOC_SOURCES).replace("'", "''")
    doc_src_list = ", ".join(repr(s) for s in DOC_SOURCES)
    clip = ("CASE WHEN length({c}) > 75 THEN '''' || substr({c}, 1, 75) "
            "|| '..''' ELSE '''' || {c} || '''' END")
    return {
        # true BPE application: recursive-CTE replay of the pinned
        # merge table (see _bpe_cte); unknown pieces -> -1 both sides
        "bpe_tokens": f"""
            WITH RECURSIVE {_bpe_cte()},
            toks AS (
              SELECT doc_id, widx, generate_subscripts(syms, 1) AS si,
                     unnest(syms) AS piece
              FROM fin),
            out AS (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY widx, si) - 1 AS pos,
                     coalesce(vv.tid, -1) AS token_id
              FROM toks LEFT JOIN v vv ON vv.tok = toks.piece)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(token_id AS BIGINT) AS token_id
            FROM out ORDER BY doc_id, pos
        """,
        # per-source unk coverage of the TRUNCATED (ids<40) vocab —
        # same merge CTE, id table filtered the same way both sides
        "bpe_coverage": f"""
            WITH RECURSIVE {_bpe_cte()},
            v40 AS (SELECT tok, tid FROM v WHERE tid < 40),
            toks AS (
              SELECT f.doc_id, unnest(f.syms) AS piece FROM fin f),
            lab AS (
              SELECT t.doc_id,
                     CASE WHEN vv.tid IS NULL THEN -1 ELSE vv.tid END
                       AS tid
              FROM toks t LEFT JOIN v40 vv ON vv.tok = t.piece),
            src AS (SELECT doc_id, source FROM documents
                    WHERE text IS NOT NULL AND doc_id IS NOT NULL)
            SELECT s.source,
                   count(*)::BIGINT AS n_tokens,
                   CAST(sum(CASE WHEN l.tid = -1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unk,
                   round(sum(CASE WHEN l.tid = -1 THEN 1 ELSE 0 END)
                         ::DOUBLE / count(*), 6) AS unk_rate
            FROM lab l JOIN src s USING (doc_id)
            GROUP BY s.source ORDER BY s.source
        """,
        # unigram-LM Viterbi tokens: exhaustive tie-free lattice replay
        "unigram_tokens": _unigram_oracle_sql(),
        "unigram_check": _unigram_check_oracle_sql(),
        # tokens-match-tokenizer violations: docs with pmod(doc_id,13)=0
        # carry one appended token 9999, so expected n / got n+1 and the
        # first divergence sits at index n (the appended position)
        "bpe_check": f"""
            WITH RECURSIVE {_bpe_cte()},
            cnt AS (SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS n
                    FROM fin GROUP BY doc_id),
            docs AS (SELECT doc_id FROM documents
                     WHERE text IS NOT NULL AND doc_id IS NOT NULL),
            n_by_doc AS (SELECT d.doc_id, coalesce(c.n, 0) AS n
                         FROM docs d LEFT JOIN cnt c USING (doc_id))
            SELECT CAST(doc_id AS BIGINT) AS id,
                   'tokens.bpe_mismatch' AS rule_id,
                   'tokens' AS position,
                   'tokens != bpe(text): expected ' || CAST(n AS VARCHAR)
                     || ' tokens, got ' || CAST(n + 1 AS VARCHAR)
                     AS message,
                   CAST(n AS VARCHAR) AS value
            FROM n_by_doc
            WHERE ((doc_id % 13) + 13) % 13 = 0
            ORDER BY id
        """,
        # char-trigram NB language ID: training AND scoring replayed
        "lang_scores": f"""
            WITH {_langid_cte()}
            SELECT CAST(id AS BIGINT) AS id, lang, score, n_grams
            FROM scores ORDER BY id, lang
        """,
        "lang_predict": f"""
            WITH {_langid_cte()},
            pred AS (
              SELECT id, lang, score,
                     row_number() OVER w AS rn,
                     score - lead(score) OVER w AS mg
              FROM scores
              WINDOW w AS (PARTITION BY id
                           ORDER BY score DESC, lang ASC))
            SELECT CAST(id AS BIGINT) AS id, lang, score,
                   round(mg, 6) AS margin
            FROM pred WHERE rn = 1 ORDER BY id
        """,
        "doc_null_rate": """
            SELECT count(*)::BIGINT AS n_rows,
                   CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   round(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS null_rate
            FROM documents
        """,
        "repair_report": """
            WITH c AS (SELECT
              (SELECT count(*) FROM documents
               WHERE lang IS NOT NULL AND lang <> ''
                 AND lang NOT IN ('en', 'de', 'fr')) AS lang_bad,
              (SELECT count(*) FROM documents
               WHERE n_chars IS NOT NULL AND n_chars > 400) AS nchars_bad,
              (SELECT count(*) FROM documents
               WHERE source IS NOT NULL AND source <> ''
                 AND length(source) > 4) AS src_bad)
            SELECT rule_id, n_before, n_after, n_repaired FROM (
              SELECT 'lang.enum' AS rule_id,
                     lang_bad::BIGINT AS n_before, 0::BIGINT AS n_after,
                     lang_bad::BIGINT AS n_repaired FROM c
              UNION ALL
              SELECT 'n_chars.max', nchars_bad::BIGINT,
                     nchars_bad::BIGINT, 0::BIGINT FROM c
              UNION ALL
              SELECT 'source.maxlen', src_bad::BIGINT,
                     0::BIGINT, src_bad::BIGINT FROM c)
            ORDER BY rule_id
        """,
        "frame_check": """
            WITH base AS (
              SELECT doc_id,
                     CAST(doc_id % 97 + 10 AS INT) AS b1,
                     CAST(n_chars % 89 + 10 AS INT) AS b2
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
            toks AS (
              SELECT doc_id,
                (CASE WHEN doc_id % 11 = 0 THEN CAST([] AS INT[])
                      ELSE [CAST(1 AS INT)] END
                 || [b1]
                 || CASE WHEN doc_id % 13 = 0 THEN [CAST(0 AS INT)]
                         ELSE CAST([] AS INT[]) END
                 || [b2]
                 || CASE WHEN doc_id % 7 = 0 THEN CAST([] AS INT[])
                         ELSE [CAST(2 AS INT)] END
                 || CASE WHEN doc_id % 3 = 1 THEN [CAST(0 AS INT)]
                         WHEN doc_id % 3 = 2
                           THEN [CAST(0 AS INT), CAST(0 AS INT)]
                         ELSE CAST([] AS INT[]) END) AS tokens
              FROM base),
            strip AS (
              SELECT doc_id, tokens,
                     ',' || array_to_string(tokens, ',') || ',' AS s,
                     regexp_replace(
                       ',' || array_to_string(tokens, ',') || ',',
                       ',(?:0,)+$', ',') AS stripped
              FROM toks),
            feats AS (
              SELECT doc_id, tokens, s, stripped,
                     regexp_extract(stripped, ',([^,]+),$', 1) AS last_tok,
                     tokens[1] AS first_tok,
                     CAST((length(s) - length(stripped)) // 2 AS BIGINT)
                       AS n_trail
              FROM strip)
            SELECT doc_id, 'tokens.bos' AS rule_id, 'tokens[0]' AS position,
                   'first token must be 1' AS message,
                   CAST(first_tok AS VARCHAR) AS value
            FROM feats
            WHERE length(last_tok) > 0
              AND (first_tok IS NULL OR first_tok <> 1)
            UNION ALL
            SELECT doc_id, 'tokens.eos',
                   'tokens[' || CAST(len(tokens) - n_trail - 1 AS VARCHAR)
                     || ']',
                   'last non-pad token must be 2', last_tok
            FROM feats WHERE length(last_tok) > 0 AND last_tok <> '2'
            UNION ALL
            SELECT doc_id, 'tokens.pad', 'tokens',
                   'pad tokens must be trailing only', '0'
            FROM feats WHERE contains(stripped, ',0,')
            UNION ALL
            SELECT doc_id, 'tokens.content', 'tokens',
                   'sequence has no content tokens',
                   CAST(len(tokens) AS VARCHAR)
            FROM feats WHERE length(last_tok) = 0
        """,
        "domain_audit": """
            WITH u AS (
              SELECT doc_id, n_chars,
                CASE WHEN doc_id % 7 = 0 THEN 'example.com'
                     WHEN doc_id % 7 = 1 THEN 'news-site.org'
                     WHEN doc_id % 7 = 2 THEN 'bbc.co.uk'
                     WHEN doc_id % 7 = 3 THEN 'spam-mill.net'
                     WHEN doc_id % 7 = 4 THEN 'example.com'
                     WHEN doc_id % 7 = 5 THEN '10.1.2.3'
                     WHEN doc_id % 13 = 0 THEN NULL
                     ELSE 'shop.co.jp' END AS domain
              FROM documents WHERE doc_id IS NOT NULL)
            SELECT domain, COUNT(*) AS n_docs,
                   round(COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (), 6)
                     AS share,
                   coalesce(domain = 'spam-mill.net', FALSE) AS blocked
            FROM u GROUP BY domain
            ORDER BY domain ASC NULLS FIRST
        """,
        "domain_cap": """
            WITH u AS (
              SELECT doc_id, n_chars,
                CASE WHEN doc_id % 7 = 0 THEN 'example.com'
                     WHEN doc_id % 7 = 1 THEN 'news-site.org'
                     WHEN doc_id % 7 = 2 THEN 'bbc.co.uk'
                     WHEN doc_id % 7 = 3 THEN 'spam-mill.net'
                     WHEN doc_id % 7 = 4 THEN 'example.com'
                     WHEN doc_id % 7 = 5 THEN '10.1.2.3'
                     WHEN doc_id % 13 = 0 THEN NULL
                     ELSE 'shop.co.jp' END AS domain
              FROM documents WHERE doc_id IS NOT NULL)
            SELECT doc_id FROM u
            QUALIFY row_number() OVER (
              PARTITION BY domain
              ORDER BY n_chars DESC NULLS LAST, doc_id) <= 25
            ORDER BY doc_id
        """,
        "chunk_text": """
            WITH w AS (
              SELECT doc_id,
                list_filter(
                  regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
                  x -> x <> '') AS words
              FROM documents WHERE doc_id IS NOT NULL),
            c AS (
              SELECT doc_id, words,
                CASE WHEN len(words) <= 40 THEN 1
                     ELSE CAST(floor((len(words) - 40 + 31) / 32.0)
                               AS INT) + 1 END AS n_chunks
              FROM w),
            e AS (
              SELECT doc_id, words, n_chunks,
                unnest(range(0, n_chunks)) AS chunk_index
              FROM c)
            SELECT doc_id, chunk_index, n_chunks,
              len(list_slice(words, chunk_index*32 + 1,
                             chunk_index*32 + 40)) AS n_words,
              md5(array_to_string(
                list_slice(words, chunk_index*32 + 1, chunk_index*32 + 40),
                ' ')) AS chunk_md5
            FROM e
            ORDER BY doc_id, chunk_index
        """,
        "chunk_tokens": """
            WITH s AS (
              SELECT doc_id,
                list_transform(
                  range(1, (abs(doc_id) % 83 + abs(n_chars) % 41 + 1) + 1),
                  x -> (doc_id * 31 + x * 7) % 997) AS tokens
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
            c AS (
              SELECT doc_id, tokens,
                CASE WHEN len(tokens) <= 16 THEN 1
                     ELSE CAST(floor((len(tokens) - 16 + 11) / 12.0)
                               AS INT) + 1 END AS n_chunks
              FROM s),
            e AS (
              SELECT doc_id, tokens, n_chunks,
                unnest(range(0, n_chunks)) AS chunk_index
              FROM c)
            SELECT doc_id, chunk_index, n_chunks,
              len(list_slice(tokens, chunk_index*12 + 1,
                             chunk_index*12 + 16)) AS n_tok,
              md5(array_to_string(
                list_slice(tokens, chunk_index*12 + 1, chunk_index*12 + 16),
                ',')) AS chunk_md5
            FROM e
            ORDER BY doc_id, chunk_index
        """,
        "bm25_topk": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         lower(coalesce(text, '')), '[^a-z0-9]+'),
                         x -> x <> '') AS w
              FROM documents),
            stats AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM toks),
            hits AS (
              SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
              FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks)
              WHERE term IN ('hash', 'join', 'merge')
              GROUP BY doc_id, term),
            tdf AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
            scored AS (
              SELECT h.doc_id,
                     sum(ln(1 + (s.n - t.df + 0.5) / (t.df + 0.5))
                         * (h.tf * 2.2)
                         / (h.tf + 1.2 * (0.25 + (h.dl * 0.75) / s.avgdl)))
                       AS score
              FROM hits h, tdf t, stats s
              WHERE h.term = t.term
              GROUP BY h.doc_id)
            SELECT doc_id, round(score, 6) AS score, CAST(rank AS INT) AS rank
            FROM (SELECT doc_id, score,
                         row_number() OVER (ORDER BY score DESC, doc_id)
                           AS rank
                  FROM scored)
            WHERE rank <= 10 ORDER BY rank
        """,
        "numeric_corr": """
            WITH p AS (
              SELECT CAST(l_quantity AS DOUBLE) AS q,
                     CAST(l_extendedprice AS DOUBLE) AS ep,
                     CAST(l_discount AS DOUBLE) AS d,
                     CAST(l_tax AS DOUBLE) AS t
              FROM lineitem)
            SELECT * FROM (
              SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                     round(corr(q, ep), 6) AS corr FROM p
              UNION ALL
              SELECT 'l_quantity', 'l_discount', round(corr(q, d), 6) FROM p
              UNION ALL
              SELECT 'l_quantity', 'l_tax', round(corr(q, t), 6) FROM p
              UNION ALL
              SELECT 'l_extendedprice', 'l_discount',
                     round(corr(ep, d), 6) FROM p
              UNION ALL
              SELECT 'l_extendedprice', 'l_tax', round(corr(ep, t), 6) FROM p
              UNION ALL
              SELECT 'l_discount', 'l_tax', round(corr(d, t), 6) FROM p
            ) ORDER BY col_a, col_b
        """,
        "knn_join": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe,
                     sqrt(list_sum(list_transform(range(1, 65),
                       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
                       AS qn
              FROM embeddings WHERE vec_id < 3),
            c AS (
              SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(range(1, 65),
                       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
                       AS cn
              FROM embeddings WHERE vec_id >= 3),
            s AS (
              SELECT q.query_id, c.vec_id,
                     list_sum(list_transform(range(1, 65),
                       i -> c.embedding[i]::DOUBLE * q.qe[i]::DOUBLE))
                       / (c.cn * q.qn) AS cos
              FROM c, q)
            SELECT query_id, vec_id, round(cos, 6) AS cosine,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cos DESC, vec_id) AS INT) AS rank
            FROM s
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        "sequences_oracle": f"""
            WITH base AS (
              SELECT doc_id, n_chars, source,
                     CAST(doc_id % 97 + 10 AS INT) AS b1,
                     CAST(n_chars % 89 + 10 AS INT) AS b2
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
            seq AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                ([b1, b2]
                 || CASE WHEN doc_id % 13 = 0 THEN [CAST(1005 AS INT)]
                         ELSE CAST([] AS INT[]) END
                 || CASE WHEN doc_id % 13 <> 0 AND doc_id % 17 = 0
                           THEN [CAST(-3 AS INT)]
                         ELSE CAST([] AS INT[]) END
                 || CASE WHEN doc_id % 19 = 0
                           THEN [CAST(11 AS INT), CAST(12 AS INT),
                                 CAST(13 AS INT)]
                         ELSE CAST([] AS INT[]) END) AS tokens,
                CASE WHEN doc_id % 23 = 0 THEN 0 END AS n0
              FROM base),
            s2 AS (
              SELECT doc_id, source, tokens,
                     coalesce(n0, len(tokens)) AS n_tok,
                     list_filter(list_transform(tokens,
                       (x, i) -> CASE WHEN (x < 0 OR x > 999) AND i <= 4
                                 THEN i END),
                       y -> y IS NOT NULL)[1] AS bad_i
              FROM seq)
            SELECT doc_id,
                   CASE WHEN tokens[bad_i] < 0 THEN 'tokens[].min'
                        ELSE 'tokens[].max' END AS rule_id,
                   'tokens[' || CAST(bad_i - 1 AS VARCHAR) || ']'
                     AS position,
                   CASE WHEN tokens[bad_i] < 0 THEN 'value must >= 0'
                        ELSE 'value must <= 999' END AS message,
                   CAST(tokens[bad_i] AS VARCHAR) AS value
            FROM s2 WHERE bad_i IS NOT NULL
            UNION ALL
            SELECT doc_id, 'tokens.maxlen', 'tokens',
                   'list length must <= 4',
                   '[' || array_to_string(tokens, ', ') || ']'
            FROM s2 WHERE len(tokens) > 4 AND bad_i IS NULL
            UNION ALL
            SELECT doc_id,
                   CASE WHEN n_tok < 1 THEN 'n_tok.min' ELSE 'n_tok.max'
                     END,
                   'n_tok',
                   CASE WHEN n_tok < 1 THEN 'value must >= 1'
                        ELSE 'value must <= 4' END,
                   CAST(n_tok AS VARCHAR)
            FROM s2 WHERE n_tok < 1 OR n_tok > 4
            UNION ALL
            SELECT doc_id, 'source.enum', 'source',
                   'expect one of {src_expects}',
                   '''' || source || ''''
            FROM s2 WHERE source NOT IN ({doc_src_list})
            ORDER BY doc_id, rule_id
        """,
        "decontaminated": """
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS ws
              FROM documents),
            grams AS (
              SELECT doc_id, unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 7, 0)),
                       i -> array_to_string(ws[i:i+7], ' '))) AS gram
              FROM w),
            bench AS (
              SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
            bad AS (
              SELECT g.doc_id
              FROM grams g JOIN bench USING (gram)
              GROUP BY g.doc_id
              HAVING count(DISTINCT g.gram) >= 2)
            SELECT d.source, count(*)::BIGINT AS n_docs
            FROM documents d LEFT JOIN bad USING (doc_id)
            WHERE bad.doc_id IS NULL
            GROUP BY d.source ORDER BY d.source
        """,
        "pack_oracle": """
            WITH RECURSIVE base AS (
              SELECT CAST(doc_id AS VARCHAR) AS id,
                     CAST(n_chars AS BIGINT) AS n,
                     row_number() OVER (
                       ORDER BY n_chars DESC NULLS LAST,
                                CAST(doc_id AS VARCHAR) ASC) AS rn
              FROM documents),
            walk AS (
              SELECT CAST(0 AS BIGINT) AS rn, CAST(-1 AS BIGINT) AS cur,
                     CAST(0 AS BIGINT) AS fill, CAST(0 AS BIGINT) AS nxt,
                     CAST(NULL AS VARCHAR) AS bin_id,
                     CAST(NULL AS BOOLEAN) AS trunc,
                     CAST(NULL AS BIGINT) AS n
              UNION ALL
              SELECT b.rn,
                CASE WHEN coalesce(b.n, 0) > 1024 THEN w.cur
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN w.nxt
                     ELSE w.cur END,
                CASE WHEN coalesce(b.n, 0) > 1024 THEN w.fill
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN coalesce(b.n, 0)
                     ELSE w.fill + coalesce(b.n, 0) END,
                CASE WHEN coalesce(b.n, 0) > 1024 THEN w.nxt + 1
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN w.nxt + 1
                     ELSE w.nxt END,
                CASE WHEN coalesce(b.n, 0) > 1024
                       THEN '0/' || CAST(w.nxt AS VARCHAR)
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN '0/' || CAST(w.nxt AS VARCHAR)
                     ELSE '0/' || CAST(w.cur AS VARCHAR) END,
                coalesce(b.n, 0) > 1024,
                coalesce(b.n, 0)
              FROM walk w JOIN base b ON b.rn = w.rn + 1),
            per AS (
              SELECT bin_id, count(*) AS n_docs, sum(n) AS tok,
                     max(CASE WHEN trunc THEN 1 ELSE 0 END) AS tr
              FROM walk WHERE rn > 0 GROUP BY bin_id)
            SELECT count(*)::BIGINT AS n_bins,
                   CAST(sum(n_docs) AS BIGINT) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS total_tokens,
                   coalesce(round(
                     sum(CASE WHEN tr = 0 THEN tok END)::DOUBLE
                     / (sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) * 1024),
                     6), 0.0) AS utilization,
                   CAST(sum(tr) AS BIGINT) AS n_truncated
            FROM per
        """,
        "w1_drift": f"""
            WITH a AS (
              SELECT quantile_cont(value,
                       [{", ".join(repr((i + 0.5) / 20) for i in range(20))}])
                       AS q,
                     count(value)::BIGINT AS n_a
              FROM events WHERE event_type = 'click'),
            b AS (
              SELECT quantile_cont(value,
                       [{", ".join(repr((i + 0.5) / 20) for i in range(20))}])
                       AS q,
                     count(value)::BIGINT AS n_b
              FROM events WHERE event_type = 'view'),
            z AS (SELECT unnest(a.q) AS qa, unnest(b.q) AS qb, n_a, n_b
                  FROM a, b)
            SELECT round(avg(abs(qa - qb)), 6) AS w1,
                   min(n_a) AS n_a, min(n_b) AS n_b
            FROM z
        """,
        "token_repetition": """
            WITH base AS (
                SELECT doc_id,
                       CAST(doc_id % 31 + 5 AS INT) AS b1,
                       CAST(n_chars % 29 + 40 AS INT) AS b2,
                       CAST(doc_id % 23 + 70 AS INT) AS b3,
                       CAST((doc_id + n_chars) % 19 + 100 AS INT) AS b4
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
            ), seq AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       list_concat(list_concat(
                           [b1, b2, b3, b4],
                           CASE WHEN doc_id % 5 = 0 THEN [b1, b1, b1]
                                ELSE CAST([] AS INT[]) END),
                           CASE WHEN doc_id % 7 = 0 THEN [b2, b3, b2, b3]
                                ELSE CAST([] AS INT[]) END) AS tokens
                FROM base
            ), grams AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(tokens)),
                                             i -> tokens[i:i+1])) AS g
                FROM seq WHERE len(tokens) >= 2
            ), per AS (
                SELECT doc_id, g, count(*) AS c,
                       max(CASE WHEN g[1] = g[2] THEN 1 ELSE 0 END) AS eq
                FROM grams GROUP BY doc_id, g
            )
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_ngrams,
                   count(*) AS n_distinct,
                   round(1.0 - count(*)::DOUBLE / sum(c)::DOUBLE, 6)
                       AS dup_ngram_frac,
                   round(max(c)::DOUBLE / sum(c)::DOUBLE, 6)
                       AS top_ngram_share,
                   round(sum(c * eq)::DOUBLE / sum(c)::DOUBLE, 6)
                       AS loop_frac
            FROM per GROUP BY doc_id ORDER BY doc_id
        """,
        "pipeline_seq": """
            WITH docs AS (
                SELECT doc_id, doc_id - doc_id % 3 AS g
                FROM documents WHERE doc_id IS NOT NULL
            ), valid AS (
                SELECT * FROM docs WHERE doc_id % 13 <> 0
            ), surv AS (
                -- survivor election is over STRING ids in the engine
                -- (the sequence table's doc_id is string-typed), so the
                -- twin must take the LEXICOGRAPHIC min, not the numeric
                SELECT g, min(CAST(doc_id AS VARCHAR)) AS doc_id
                FROM valid GROUP BY g
            )
            SELECT doc_id, CAST(12 AS INT) AS n_tok
            FROM surv WHERE g % 30 <> 0
            ORDER BY doc_id
        """,
        "token_contamination": """
            WITH words AS (
                SELECT doc_id,
                       list_transform(range(0, 12), k ->
                           (CASE WHEN doc_id % 50 <> 0 AND doc_id % 25 = 0
                                      AND k < 9
                                 THEN (doc_id - 25) * 997 + k
                                 ELSE doc_id * 997 + k
                            END) % 100003) AS w
                FROM documents WHERE doc_id IS NOT NULL
            ), grams AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, 6),
                           i -> array_to_string(w[i:i+7], ','))) AS g
                FROM words
            ), bench AS (
                SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
            ), hits AS (
                SELECT grams.doc_id, count(DISTINCT grams.g) AS n_hits
                FROM grams JOIN bench ON grams.g = bench.g
                GROUP BY grams.doc_id
            )
            SELECT CAST(words.doc_id AS VARCHAR) AS doc_id,
                   CAST(len(w) - 7 AS BIGINT) AS n_grams,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   round(coalesce(h.n_hits, 0)::DOUBLE
                         / (len(w) - 7)::DOUBLE, 6) AS hit_fraction,
                   coalesce(h.n_hits, 0) >= 1 AS contaminated
            FROM words LEFT JOIN hits h ON words.doc_id = h.doc_id
            ORDER BY doc_id
        """,
        "dedup_sequences": """
            WITH base AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 41 = 0 THEN
                           [CAST(doc_id % 31 + 5 AS INT), NULL,
                            CAST(doc_id % 23 + 7 AS INT)]
                       ELSE
                           [CAST((doc_id - doc_id % 5) % 31 + 5 AS INT),
                            CAST((doc_id - doc_id % 5) % 29 + 3 AS INT),
                            CAST((doc_id - doc_id % 5) % 23 + 7 AS INT),
                            CAST((doc_id - doc_id % 5) % 19 + 2 AS INT)]
                       END AS tokens
                FROM documents WHERE doc_id IS NOT NULL
            ), survivors AS (
                SELECT min(doc_id) AS doc_id, tokens
                FROM base WHERE doc_id % 41 <> 0 GROUP BY tokens
            ), passthrough AS (
                SELECT doc_id, tokens FROM base WHERE doc_id % 41 = 0
            ), u AS (
                SELECT * FROM survivors UNION ALL SELECT * FROM passthrough
            )
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(len(tokens) AS INT) AS n_tok
            FROM u ORDER BY doc_id
        """,
        "dialog_render": """
            WITH c AS (SELECT chr(10) || chr(10) AS s)
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CASE
                     WHEN doc_id % 23 = 0 THEN ''
                     WHEN doc_id % 19 = 0 THEN
                       'system: sys-' || doc_id || s || 'system: late'
                       || s || 'user: u-' || doc_id || s
                       || 'assistant: a-' || doc_id
                     WHEN doc_id % 17 = 0 THEN
                       'system: sys-' || doc_id || s || 'tool: beep'
                       || s || 'assistant: a-' || doc_id
                     WHEN doc_id % 13 = 0 THEN
                       'system: sys-' || doc_id || s || 'user: ' || s
                       || 'assistant: a-' || doc_id
                     WHEN doc_id % 11 = 0 THEN
                       'system: sys-' || doc_id || s || 'user: u-'
                       || doc_id || s || 'assistant: a-' || doc_id
                       || s || 'user: bye'
                     ELSE
                       'system: sys-' || doc_id || s || 'user: u-'
                       || doc_id || s || 'assistant: a-' || doc_id
                   END AS text,
                   CAST(CASE WHEN doc_id % 23 = 0 THEN 0
                             WHEN doc_id % 19 = 0 OR (doc_id % 23 <> 0
                                  AND doc_id % 19 <> 0 AND doc_id % 17 <> 0
                                  AND doc_id % 13 <> 0 AND doc_id % 11 = 0)
                                  THEN 4
                             ELSE 3 END AS BIGINT) AS n_turns
            FROM documents, c
            WHERE doc_id IS NOT NULL
            ORDER BY doc_id
        """,
        "preference_check": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CASE WHEN doc_id % 23 = 0 THEN 'pair.identical'
                        WHEN doc_id % 19 = 0 THEN 'pair.identical_normalized'
                        WHEN doc_id % 17 = 0 THEN 'prompt.required'
                        WHEN doc_id % 13 = 0 THEN 'chosen.required'
                        ELSE 'rejected.required' END AS rule_id,
                   CASE WHEN doc_id % 23 = 0 OR doc_id % 19 = 0
                            THEN 'chosen'
                        WHEN doc_id % 17 = 0 THEN 'prompt'
                        WHEN doc_id % 13 = 0 THEN 'chosen'
                        ELSE 'rejected' END AS position,
                   CASE WHEN doc_id % 23 = 0
                            THEN 'chosen and rejected are identical'
                        WHEN doc_id % 19 = 0 THEN
                            'chosen and rejected differ only in case/whitespace'
                        ELSE 'required' END AS message,
                   CASE WHEN doc_id % 23 = 0
                            THEN 'same-' || CAST(doc_id AS VARCHAR)
                        WHEN doc_id % 19 = 0
                            THEN 'AN  ANSWER ' || CAST(doc_id AS VARCHAR)
                        ELSE NULL END AS value
            FROM documents
            WHERE doc_id IS NOT NULL
              AND (doc_id % 23 = 0 OR doc_id % 19 = 0 OR doc_id % 17 = 0
                   OR doc_id % 13 = 0 OR doc_id % 11 = 0)
            ORDER BY doc_id, rule_id
        """,
        "ngram_novelty": """
            WITH docs AS (
                SELECT doc_id FROM documents WHERE doc_id IS NOT NULL
            ), words AS (
                SELECT doc_id,
                       list_transform(range(0, 12), k ->
                           'w' || CAST((
                               CASE WHEN doc_id % 2 = 1 AND doc_id % 10 = 5
                                        THEN (doc_id - 5) * 997 + k
                                    WHEN doc_id % 2 = 1 AND doc_id % 10 = 7
                                         AND k < 9
                                        THEN (doc_id - 7) * 997 + k
                                    ELSE doc_id * 997 + k
                               END) % 100003 AS VARCHAR)) AS w
                FROM docs
            ), grams AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, 6),
                           i -> array_to_string(w[i:i+7], ' '))) AS g
                FROM words
            ), ref AS (
                SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0
            ), ev AS (
                SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 2 = 1
            )
            SELECT CAST(ev.doc_id AS VARCHAR) AS doc_id,
                   count(*) AS n_grams,
                   CAST(sum(CASE WHEN ref.g IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_seen,
                   round(1.0 - sum(CASE WHEN ref.g IS NOT NULL THEN 1
                                        ELSE 0 END)::DOUBLE
                             / count(*)::DOUBLE, 6) AS novelty
            FROM ev LEFT JOIN ref ON ev.g = ref.g
            GROUP BY ev.doc_id ORDER BY doc_id
        """,
        "dialog_check": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CASE WHEN doc_id % 23 = 0 THEN 'turns.required'
                        WHEN doc_id % 19 = 0 THEN 'turns.system_position'
                        WHEN doc_id % 17 = 0 THEN 'turns[].role.enum'
                        WHEN doc_id % 13 = 0 THEN 'turns[].content.required'
                        ELSE 'turns.last_role' END AS rule_id,
                   CASE WHEN doc_id % 23 = 0 THEN 'turns'
                        WHEN doc_id % 19 = 0 THEN 'turns[1].role'
                        WHEN doc_id % 17 = 0 THEN 'turns[1].role'
                        WHEN doc_id % 13 = 0 THEN 'turns[1].content'
                        ELSE 'turns' END AS position,
                   CASE WHEN doc_id % 23 = 0 THEN 'required'
                        WHEN doc_id % 19 = 0
                             THEN 'system turn only allowed at index 0'
                        WHEN doc_id % 17 = 0 THEN
                             'expect one of {''system'', ''user'', ''assistant''}'
                        WHEN doc_id % 13 = 0 THEN 'required'
                        ELSE 'last turn must be assistant' END AS message,
                   CASE WHEN doc_id % 23 = 0 THEN NULL
                        WHEN doc_id % 19 = 0 THEN 'system'
                        WHEN doc_id % 17 = 0 THEN 'tool'
                        WHEN doc_id % 13 = 0 THEN NULL
                        ELSE 'user' END AS value
            FROM documents
            WHERE doc_id IS NOT NULL
              AND (doc_id % 23 = 0 OR doc_id % 19 = 0 OR doc_id % 17 = 0
                   OR doc_id % 13 = 0 OR doc_id % 11 = 0)
            ORDER BY doc_id, rule_id
        """,
        "sampled_audit": """
            WITH s AS (
              SELECT * FROM documents
              WHERE substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8)
                    < '40000000'),
            tot AS (SELECT count(*)::BIGINT AS n_sample FROM s),
            v AS (
              SELECT 'n_chars.min' AS rule_id FROM s WHERE n_chars < 50
              UNION ALL
              SELECT 'n_chars.max' FROM s WHERE n_chars > 400
              UNION ALL
              SELECT 'lang.enum' FROM s
              WHERE lang NOT IN ('en','de','fr','es')),
            per AS (SELECT rule_id, count(*)::BIGINT AS n_viol
                    FROM v GROUP BY rule_id),
            calc AS (
              SELECT rule_id, n_sample, n_viol,
                     n_viol::DOUBLE / n_sample AS p,
                     n_sample::DOUBLE AS n
              FROM per, tot)
            SELECT rule_id, n_sample, n_viol,
              round(n_viol::DOUBLE / n_sample, 6) AS rate,
              round(greatest(0.0,
                (p + 3.841458881296/(2.0*n)) / (1.0 + 3.841458881296/n)
                - (1.959964*sqrt(p*(1.0-p)/n + 3.841458881296/(4.0*n*n))
                   / (1.0 + 3.841458881296/n))), 6) AS rate_lo,
              round(least(1.0,
                (p + 3.841458881296/(2.0*n)) / (1.0 + 3.841458881296/n)
                + (1.959964*sqrt(p*(1.0-p)/n + 3.841458881296/(4.0*n*n))
                   / (1.0 + 3.841458881296/n))), 6) AS rate_hi,
              CAST(round(n_viol / 0.25, 0) AS BIGINT) AS est_violations
            FROM calc ORDER BY rule_id
        """,
        "doc_length_stats": """
            SELECT lang, count(*)::BIGINT AS n_docs,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "unique_doc_id": """
            SELECT CAST(sum(n) AS BIGINT) AS n_rows,
                   count(*)::BIGINT AS n_keys,
                   CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
                   CAST(sum(n - 1) AS BIGINT) AS n_surplus_rows
            FROM (SELECT doc_id, count(*) AS n FROM documents GROUP BY doc_id)
        """,
        "ref_orphans": """
            SELECT count(*)::BIGINT AS n_orphans
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
        """,
        "lineitem_violations": """
            WITH v AS (
              SELECT CASE
                  WHEN l_quantity < 1 THEN 'l_quantity.min'
                  WHEN l_quantity > 45 THEN 'l_quantity.max' END AS r1,
                CASE
                  WHEN l_discount < 0 THEN 'l_discount.min'
                  WHEN l_discount > 0.08 THEN 'l_discount.max' END AS r2,
                CASE
                  WHEN l_tax < 0 THEN 'l_tax.min'
                  WHEN l_tax > 0.06 THEN 'l_tax.max' END AS r3,
                CASE
                  WHEN l_extendedprice <= 0 THEN 'l_extendedprice.min' END AS r4
              FROM lineitem
            ), u AS (
              SELECT r1 AS rule_id FROM v WHERE r1 IS NOT NULL
              UNION ALL SELECT r2 FROM v WHERE r2 IS NOT NULL
              UNION ALL SELECT r3 FROM v WHERE r3 IS NOT NULL
              UNION ALL SELECT r4 FROM v WHERE r4 IS NOT NULL
            )
            SELECT rule_id, count(*)::BIGINT AS n_violations
            FROM u GROUP BY rule_id ORDER BY rule_id
        """,
        "validate_documents": f"""
            WITH {_doc_viol_cte(doc_src_list, lang_expects, src_expects,
                                clip)}
            SELECT * FROM viol ORDER BY id, rule_id
        """,
        "violation_triage": f"""
            WITH {_doc_viol_cte(doc_src_list, lang_expects, src_expects,
                                clip)},
            c AS (SELECT rule_id, value, count(*)::BIGINT AS n
                  FROM viol GROUP BY rule_id, value),
            t AS (SELECT rule_id, CAST(sum(n) AS BIGINT) AS tt
                  FROM c GROUP BY rule_id)
            SELECT c.rule_id,
                   CAST(row_number() OVER (
                     PARTITION BY c.rule_id
                     ORDER BY n DESC, value ASC NULLS FIRST) AS INT)
                     AS rank,
                   c.value, c.n,
                   round(n::DOUBLE / tt, 6) AS share
            FROM c JOIN t USING (rule_id)
            QUALIFY rank <= 3
            ORDER BY rule_id, rank
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))
                            * (1 - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS sum_disc_price,
                   round(CAST(avg(CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE), 6) AS avg_disc,
                   count(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "events_chi2": """
            WITH c AS (SELECT event_type, count(*)::DOUBLE AS n
                       FROM events GROUP BY event_type),
                 t AS (SELECT avg(n) AS exp FROM c)
            SELECT round(sum((n - exp) * (n - exp) / exp), 6) AS chi2,
                   count(*)::BIGINT AS n_categories
            FROM c, t
        """,
        "ks_drift": """
            WITH u AS (
              SELECT value AS x,
                     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
                     CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
              FROM events WHERE event_type IN ('click', 'view')
            ), t AS (
              SELECT sum(ia)::DOUBLE AS na, sum(ib)::DOUBLE AS nb FROM u
            ), c AS (
              SELECT x, sum(ia) OVER (ORDER BY x) AS ca,
                     sum(ib) OVER (ORDER BY x) AS cb FROM u
            ), m AS (
              SELECT x, max(ca) AS ca, max(cb) AS cb FROM c GROUP BY x
            )
            SELECT round(max(abs(ca / na - cb / nb)), 6) AS ks FROM m, t
        """,
        "dedup_prefix": """
            SELECT md5(lower(trim(regexp_replace(substr(text, 1, 20),
                                                 '\\s+', ' ', 'g')))) AS fingerprint,
                   count(*)::BIGINT AS n_docs
            FROM documents
            GROUP BY 1 HAVING count(*) > 1
            ORDER BY fingerprint
        """,
        "emb_drift": r"""
            WITH ex AS (
              SELECT vec_id % 2 AS g,
                     unnest(generate_series(1, len(embedding))) AS pos,
                     unnest(embedding) AS v
              FROM embeddings WHERE embedding IS NOT NULL
            ), st AS (
              SELECT g, pos, count(*) AS n, avg(v::DOUBLE) AS m,
                     var_pop(v::DOUBLE) AS va
              FROM ex GROUP BY g, pos
            ), j AS (
              SELECT a.pos, a.n AS na, a.m AS ma, a.va AS va,
                     b.n AS nb, b.m AS mb, b.va AS vb
              FROM st a JOIN st b ON a.pos = b.pos
              WHERE a.g = 0 AND b.g = 1
            ), zz AS (
              SELECT CASE WHEN sqrt(va/na + vb/nb) > 0
                          THEN abs(ma - mb) / sqrt(va/na + vb/nb)
                          ELSE 0 END AS z,
                     (ma - mb) * (ma - mb) AS d2, na, nb
              FROM j)
            SELECT count(*)::BIGINT AS n_dims,
                   CAST(sum(CASE WHEN z > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dims_shifted,
                   round(max(z), 6) AS max_abs_z,
                   round(sqrt(sum(d2)), 6) AS mean_shift_l2,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b
            FROM zz
        """,
        "dup_spans": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents WHERE text IS NOT NULL),
            g AS (
              SELECT doc_id,
                     unnest(generate_series(1, greatest(len(ws) - 7, 0)))
                       - 1 AS pos,
                     unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 7, 0)),
                       i -> array_to_string(ws[i:i+7], ' '))) AS gram
              FROM w),
            rn AS (
              SELECT doc_id, pos, gram,
                     row_number() OVER (PARTITION BY gram
                                        ORDER BY doc_id, pos) AS rn
              FROM g),
            dup AS (
              SELECT gram FROM g
              GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
            hits AS (
              SELECT r.doc_id, r.pos, (r.rn = 1) AS isf
              FROM rn r JOIN dup USING (gram)),
            isl AS (
              SELECT doc_id, pos, isf,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM hits)
            SELECT doc_id, min(pos)::BIGINT AS start_word,
                   (max(pos) + 7)::BIGINT AS end_word,
                   count(*)::BIGINT AS n_grams,
                   max(isf) AS keep
            FROM isl GROUP BY doc_id, grp
            ORDER BY doc_id, start_word
        """,
        "doc_entropy": r"""
            WITH wrds AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS w
              FROM documents WHERE text IS NOT NULL),
            pw AS (
              SELECT doc_id, w, count(*) AS c
              FROM wrds WHERE w <> '' GROUP BY doc_id, w)
            SELECT doc_id, sum(c)::BIGINT AS n_words,
                   count(*)::BIGINT AS n_distinct_words,
                   round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6)
                     AS entropy
            FROM pw GROUP BY doc_id ORDER BY doc_id
        """,
        "minhash_oracle": _minhash_oracle_sql(),
        "ngram_jaccard": _ngram_jaccard_oracle_sql(),
        "simhash_oracle": _simhash_oracle_sql(),
        "jaccard_exact": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents WHERE doc_id < 60 AND text IS NOT NULL),
            g AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 2, 0)),
                       i -> array_to_string(ws[i:i+2], ' '))) AS gram
              FROM w),
            sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM g a JOIN g b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.01
            ORDER BY id_a, id_b
        """,
        "psi_groups": r"""
            WITH rng AS (
              SELECT event_type AS grp, min(value) AS lo, max(value) AS hi
              FROM events
              WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
            rb AS (
              SELECT r.grp,
                     CASE WHEN r.hi > r.lo
                          THEN least(greatest(CAST(floor((e.value - r.lo)
                            / ((r.hi - r.lo) / 10)) AS INT), 0), 9)
                          ELSE 0 END AS bin,
                     count(*)::BIGINT AS n_ref
              FROM events e JOIN rng r ON e.event_type = r.grp
              WHERE e.event_id % 2 = 0 AND e.value IS NOT NULL
              GROUP BY 1, 2),
            nb AS (
              SELECT r.grp,
                     CASE WHEN r.hi > r.lo
                          THEN least(greatest(CAST(floor((e.value - r.lo)
                            / ((r.hi - r.lo) / 10)) AS INT), 0), 9)
                          ELSE 0 END AS bin,
                     count(*)::BIGINT AS n_new
              FROM events e JOIN rng r ON e.event_type = r.grp
              WHERE e.event_id % 2 = 1 AND e.value IS NOT NULL
              GROUP BY 1, 2),
            j AS (
              SELECT coalesce(rb.grp, nb.grp) AS grp,
                     coalesce(rb.bin, nb.bin) AS bin,
                     coalesce(n_ref, 0) AS n_ref,
                     coalesce(n_new, 0) AS n_new
              FROM rb FULL OUTER JOIN nb
                ON rb.grp = nb.grp AND rb.bin = nb.bin),
            tot AS (SELECT grp, sum(n_ref)::DOUBLE AS tr,
                           sum(n_new)::DOUBLE AS tn FROM j GROUP BY 1)
            SELECT j.grp AS event_type,
                   CASE WHEN any_value(tn) > 0 THEN
                     round(sum((greatest(n_ref / tr, 1e-6)
                                - greatest(n_new / tn, 1e-6))
                           * ln(greatest(n_ref / tr, 1e-6)
                                / greatest(n_new / tn, 1e-6))), 6)
                   END AS psi,
                   any_value(tr)::BIGINT AS n_ref_rows,
                   any_value(tn)::BIGINT AS n_new_rows
            FROM j JOIN tot ON tot.grp = j.grp
            GROUP BY j.grp ORDER BY 1
        """,
        "value_variants": r"""
            WITH c AS (
              SELECT CASE WHEN doc_id % 11 = 0 THEN upper(lang)
                          WHEN doc_id % 11 = 1 THEN lang || ' '
                          ELSE lang END AS raw
              FROM documents WHERE lang IS NOT NULL),
            cnt AS (SELECT raw, count(*) AS n FROM c GROUP BY 1),
            keyed AS (
              SELECT raw, n,
                     regexp_replace(lower(trim(raw)), '\s+', ' ', 'g')
                       AS key,
                     row_number() OVER (
                       PARTITION BY regexp_replace(lower(trim(raw)),
                                                   '\s+', ' ', 'g')
                       ORDER BY n DESC, raw) AS rk
              FROM cnt)
            SELECT key,
                   min(CASE WHEN rk = 1 THEN raw END) AS canonical,
                   count(*) AS n_variants,
                   sum(n)::BIGINT AS n_rows,
                   array_to_string(
                     list(raw ORDER BY rk) FILTER (WHERE rk <= 8), '|')
                     AS variants
            FROM keyed GROUP BY key HAVING count(*) > 1
            ORDER BY sum(n) DESC, key
        """,
        "clean_text": r"""
            WITH base AS (
              SELECT source, doc_id,
                     'doc ' || (doc_id % 13)::VARCHAR || ' body' AS text
              FROM documents),
            messy AS (
              SELECT source,
                     CASE WHEN doc_id % 7 = 0
                          THEN chr(1) || '  ' || text || '  '
                               || chr(8203) || ' e' || chr(769)
                          ELSE text END AS text
              FROM base),
            cleaned AS (
              SELECT source, nfc_normalize(trim(
                regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(text,
                    '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}]',
                    '', 'g'),
                  '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g'),
                  '[ \t\r]*\n[ \t\r\n]*', chr(10), 'g'),
                  '[ \t\r]+', ' ', 'g'))) AS text
              FROM messy)
            SELECT source, count(text) AS n_docs,
                   sum(length(text))::BIGINT AS total_chars
            FROM cleaned GROUP BY source ORDER BY source
        """,
        "position_stats": r"""
            WITH seq AS (
              SELECT [(doc_id % 97 + 10)::INT, (n_chars % 89 + 10)::INT,
                      (doc_id % 7)::INT, (doc_id % 5)::INT] AS tokens
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
            pt AS (
              SELECT g.pos, g.tok AS token, count(*) AS c
              FROM (SELECT unnest(list_transform(
                      generate_series(1, 4),
                      i -> {'pos': i - 1, 'tok': tokens[i]})) AS g
                    FROM seq)
              GROUP BY 1, 2),
            ranked AS (
              SELECT pos, token, c,
                     row_number() OVER (PARTITION BY pos
                                        ORDER BY c DESC, token) AS rk
              FROM pt)
            SELECT pos,
                   sum(c)::BIGINT AS n_seqs,
                   count(*) AS n_distinct_tokens,
                   min(CASE WHEN rk = 1 THEN token END) AS top_token
            FROM ranked GROUP BY pos ORDER BY pos
        """,
        "split_leakage": r"""
            WITH t AS (
              SELECT doc_id,
                     'leak blob ' || (doc_id % 7)::VARCHAR AS text,
                     CASE WHEN doc_id % 2 = 0 THEN 'train'
                          ELSE 'test' END AS split
              FROM documents WHERE doc_id < 100)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.split AS split_a, b.split AS split_b,
                   1.0::DOUBLE AS score
            FROM t a JOIN t b
              ON a.doc_id < b.doc_id AND a.text = b.text
             AND a.split <> b.split
            ORDER BY id_a, id_b
        """,
        "source_overlap": r"""
            WITH t AS (
              SELECT CASE WHEN doc_id % 10 < 2
                          THEN 'shared blob ' || (doc_id % 7)::VARCHAR
                          ELSE text END AS text,
                     source
              FROM documents),
            fp AS (
              SELECT DISTINCT
                     md5(regexp_replace(lower(trim(text)),
                                        '\s+', ' ', 'g')) AS fp,
                     source AS src
              FROM t WHERE text IS NOT NULL),
            tot AS (SELECT src, count(*) AS n_distinct FROM fp GROUP BY 1),
            p AS (
              SELECT a.src AS source_a, b.src AS source_b,
                     count(*) AS n_shared
              FROM fp a JOIN fp b
                ON a.fp = b.fp AND a.src <> b.src
              GROUP BY 1, 2)
            SELECT source_a, source_b, n_shared,
                   round(n_shared::DOUBLE / n_distinct, 6) AS frac_of_a
            FROM p JOIN tot ON tot.src = p.source_a
            ORDER BY source_a, source_b
        """,
        "fuzzy_ref": r"""
            WITH dim AS (SELECT DISTINCT source FROM documents),
            c AS (
              SELECT CASE WHEN doc_id % 13 = 0 THEN source || 'x'
                          WHEN doc_id % 17 = 0 THEN 'zzz'
                          ELSE source END AS value
              FROM documents),
            vals AS (
              SELECT value, count(*) AS n_rows FROM c
              WHERE value IS NOT NULL GROUP BY 1),
            miss AS (
              SELECT * FROM vals
              WHERE value NOT IN (SELECT source FROM dim)),
            sugg AS (
              SELECT m.value, min(d.source) AS suggestion
              FROM miss m JOIN dim d
                ON levenshtein(m.value, d.source) <= 1
              GROUP BY 1)
            SELECT m.value, m.n_rows,
                   CASE WHEN s.suggestion IS NOT NULL
                        THEN 'near_miss' ELSE 'orphan' END AS status,
                   s.suggestion
            FROM miss m LEFT JOIN sugg s ON m.value = s.value
            ORDER BY m.value
        """,
        "upsample": r"""
            WITH rated AS (
              SELECT doc_id, source,
                     CASE source WHEN 'src0' THEN 2.5
                                 WHEN 'src1' THEN 0.4
                                 ELSE 1.0 END AS rate
              FROM documents),
            exploded AS (
              SELECT doc_id, source, rate,
                     unnest(generate_series(0,
                       CAST(ceil(rate) AS INT) - 1)) AS epoch
              FROM rated WHERE rate > 0),
            kept AS (
              SELECT source, epoch FROM exploded
              WHERE (rate - epoch) >= 1.0
                 OR substr(md5('42|' || epoch::VARCHAR || '|'
                               || doc_id::VARCHAR), 1, 8)
                    < lpad(lower(hex(CAST(floor((rate - epoch)
                                     * 4294967296.0) AS BIGINT))), 8, '0'))
            SELECT source, epoch::INT AS epoch, count(*) AS n
            FROM kept GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "vocab_coverage": r"""
            WITH p0 AS (
              SELECT unnest(regexp_extract_all(
                text, '[A-Za-z]{1,4}|\d|[^\w\s]')) AS piece
              FROM documents WHERE text IS NOT NULL),
            c AS (SELECT piece, count(*) AS cnt FROM p0 GROUP BY 1),
            top AS (SELECT piece FROM c
                    ORDER BY cnt DESC, piece LIMIT 200),
            p AS (
              SELECT source, unnest(regexp_extract_all(
                text, '[A-Za-z]{1,4}|\d|[^\w\s]')) AS piece
              FROM documents WHERE text IS NOT NULL)
            SELECT source,
                   count(*) AS n_pieces,
                   sum(CASE WHEN piece NOT IN (SELECT piece FROM top)
                       THEN 1 ELSE 0 END)::BIGINT AS n_oov,
                   ((1000000 * sum(CASE WHEN piece NOT IN
                                        (SELECT piece FROM top)
                                   THEN 1 ELSE 0 END)) // count(*)
                     )::BIGINT AS oov_ppm
            FROM p GROUP BY source ORDER BY source
        """,
        "vocab": r"""
            WITH p AS (
              SELECT unnest(regexp_extract_all(
                text, '[A-Za-z]{1,4}|\d|[^\w\s]')) AS piece
              FROM documents WHERE text IS NOT NULL),
            c AS (SELECT piece, count(*) AS cnt FROM p GROUP BY 1),
            t AS (SELECT sum(cnt)::DOUBLE AS t FROM c),
            top AS (SELECT piece, cnt FROM c
                    ORDER BY cnt DESC, piece LIMIT 200),
            r AS (
              SELECT piece,
                     (row_number() OVER (ORDER BY cnt DESC, piece)
                      + 3)::INT AS token_id,
                     cnt AS count,
                     round(sum(cnt) OVER (ORDER BY cnt DESC, piece
                           ROWS UNBOUNDED PRECEDING) / t.t, 6)
                       AS cum_coverage
              FROM top, t)
            SELECT * FROM (
              SELECT * FROM (VALUES
                ('<pad>', 0, NULL::BIGINT, NULL::DOUBLE),
                ('<bos>', 1, NULL, NULL),
                ('<eos>', 2, NULL, NULL),
                ('<unk>', 3, NULL, NULL))
                v(piece, token_id, count, cum_coverage)
              UNION ALL SELECT * FROM r)
            ORDER BY token_id
        """,
        "table_fp": r"""
            SELECT count(*) AS n_rows,
                   bit_xor(('0x' || substr(md5(
                       CASE WHEN l_orderkey IS NULL THEN 'N'
                            ELSE length(l_orderkey::VARCHAR)::VARCHAR
                                 || ':' || l_orderkey::VARCHAR END ||
                       CASE WHEN l_partkey IS NULL THEN 'N'
                            ELSE length(l_partkey::VARCHAR)::VARCHAR
                                 || ':' || l_partkey::VARCHAR END ||
                       CASE WHEN l_linenumber IS NULL THEN 'N'
                            ELSE length(l_linenumber::VARCHAR)::VARCHAR
                                 || ':' || l_linenumber::VARCHAR END ||
                       CASE WHEN l_returnflag IS NULL THEN 'N'
                            ELSE length(l_returnflag)::VARCHAR
                                 || ':' || l_returnflag END),
                     1, 15))::BIGINT) AS fingerprint
            FROM lineitem
        """,
        "psi_quantile": r"""
            WITH src AS (
              SELECT n_chars::DOUBLE AS x, lang FROM documents
              WHERE n_chars IS NOT NULL),
            e AS (SELECT quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,
                                           0.6,0.7,0.8,0.9]) AS ed
                  FROM src),
            rb AS (
              SELECT ((x >= ed[1])::INT + (x >= ed[2])::INT
                    + (x >= ed[3])::INT + (x >= ed[4])::INT
                    + (x >= ed[5])::INT + (x >= ed[6])::INT
                    + (x >= ed[7])::INT + (x >= ed[8])::INT
                    + (x >= ed[9])::INT) AS bin,
                     count(*)::BIGINT AS n_ref
              FROM src, e GROUP BY 1),
            nb AS (
              SELECT ((x >= ed[1])::INT + (x >= ed[2])::INT
                    + (x >= ed[3])::INT + (x >= ed[4])::INT
                    + (x >= ed[5])::INT + (x >= ed[6])::INT
                    + (x >= ed[7])::INT + (x >= ed[8])::INT
                    + (x >= ed[9])::INT) AS bin,
                     count(*)::BIGINT AS n_new
              FROM src, e WHERE lang = 'en' GROUP BY 1),
            j AS (
              SELECT coalesce(rb.bin, nb.bin) AS bin,
                     coalesce(n_ref, 0) AS n_ref,
                     coalesce(n_new, 0) AS n_new
              FROM rb FULL OUTER JOIN nb ON rb.bin = nb.bin),
            tot AS (SELECT sum(n_ref)::DOUBLE AS tr,
                           sum(n_new)::DOUBLE AS tn FROM j)
            SELECT round(sum((greatest(n_ref / tr, 1e-6)
                              - greatest(n_new / tn, 1e-6))
                          * ln(greatest(n_ref / tr, 1e-6)
                               / greatest(n_new / tn, 1e-6))), 6) AS psi,
                   count(*)::BIGINT AS n_bins
            FROM j, tot
        """,
        "temperature_mix": r"""
            WITH per AS (
              SELECT source AS grp, sum(n_chars)::DOUBLE AS n
              FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS t FROM per),
            s AS (SELECT grp, n, n / t AS p, sqrt(n / t) AS pa
                  FROM per, t),
            z AS (SELECT sum(pa) AS z FROM s)
            SELECT grp, n, round(p, 6) AS p, round(pa / z, 6) AS q,
                   floor(round(pa / z, 6) * 10000000)::BIGINT AS budget
            FROM s, z ORDER BY grp
        """,
        "resample_daily": r"""
            WITH c AS (
              SELECT event_type,
                     (floor(epoch_us(ts) / 1000000.0 / 86400)
                      * 86400)::BIGINT AS bucket,
                     count(*) AS n_events,
                     sum(value::DECIMAL(18,6)) AS sv
              FROM events WHERE ts IS NOT NULL
              GROUP BY 1, 2),
            s AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
                  FROM c GROUP BY 1),
            spine AS (
              SELECT event_type,
                     unnest(generate_series(lo, hi, 86400)) AS bucket
              FROM s)
            SELECT spine.event_type, spine.bucket,
                   coalesce(n_events, 0) AS n_events,
                   round(sv::DOUBLE, 6) AS sum_value
            FROM spine LEFT JOIN c USING (event_type, bucket)
            ORDER BY 1, 2
        """,
        "join_fanout": r"""
            WITH lc AS (
              SELECT user_id AS key, count(*) AS n_left
              FROM events WHERE user_id IS NOT NULL GROUP BY 1),
            rc AS (
              SELECT user_id AS key, count(*) AS n_right
              FROM events
              WHERE user_id IS NOT NULL AND event_type = 'click'
              GROUP BY 1),
            p AS (
              SELECT lc.key, n_left, n_right, n_left * n_right AS out_rows
              FROM lc JOIN rc ON lc.key = rc.key),
            t AS (SELECT sum(out_rows) AS t FROM p)
            SELECT key, n_left, n_right, out_rows,
                   round(out_rows::DOUBLE / t, 6) AS out_share
            FROM p, t ORDER BY out_rows DESC, key LIMIT 15
        """,
        "nfc_audit": r"""
            WITH base AS (
              SELECT source, doc_id,
                     'line ' || (doc_id % 17)::VARCHAR AS text
              FROM documents),
            t AS (
              SELECT source,
                     CASE WHEN doc_id % 5 = 0
                          THEN text || ' e' || chr(769)
                          WHEN doc_id % 5 = 1 THEN text || ' ' || chr(233)
                          ELSE text END AS text
              FROM base)
            SELECT source,
                   count(text) AS n_docs,
                   sum(CASE WHEN text IS NOT NULL AND NOT
                            regexp_matches(text, '^[\x00-\x7F]*$')
                       THEN 1 ELSE 0 END)::BIGINT AS n_non_ascii,
                   sum(CASE WHEN text IS NOT NULL AND
                            nfc_normalize(text) <> text
                       THEN 1 ELSE 0 END)::BIGINT AS n_not_nfc,
                   ((1000000 * sum(CASE WHEN text IS NOT NULL AND
                                        nfc_normalize(text) <> text
                                   THEN 1 ELSE 0 END))
                     // nullif(count(text), 0))::BIGINT AS not_nfc_ppm
            FROM t GROUP BY source ORDER BY source
        """,
        "collocations": r"""
            WITH w AS (
              SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
            ucnt AS (
              SELECT w, count(*) AS w_count
              FROM (SELECT unnest(ws) AS w FROM w) GROUP BY w),
            big AS (
              SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                            i -> {'w1': ws[i], 'w2': ws[i+1]})) AS g
              FROM w WHERE len(ws) >= 2),
            bcnt AS (
              SELECT g.w1 AS w1, g.w2 AS w2, count(*) AS pair_count
              FROM big GROUP BY 1, 2),
            tot AS (SELECT (SELECT sum(w_count) FROM ucnt) AS nw,
                           (SELECT sum(pair_count) FROM bcnt) AS nb)
            SELECT w1, w2, pair_count,
                   u1.w_count AS w1_count, u2.w_count AS w2_count,
                   round((pair_count::DOUBLE * nw * nw)
                         / (u1.w_count::DOUBLE * u2.w_count * nb), 6) AS lift
            FROM bcnt JOIN ucnt u1 ON u1.w = bcnt.w1
                      JOIN ucnt u2 ON u2.w = bcnt.w2, tot
            WHERE pair_count >= 5
            ORDER BY pair_count DESC, w1, w2 LIMIT 40
        """,
        "containment": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents WHERE doc_id < 60 AND text IS NOT NULL),
            g AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 2, 0)),
                       i -> array_to_string(ws[i:i+2], ' '))) AS gram
              FROM w),
            sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM g a JOIN g b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(i::DOUBLE / sa.n, 6) AS containment_a,
                   round(i::DOUBLE / sb.n, 6) AS containment_b,
                   round(greatest(i::DOUBLE / sa.n, i::DOUBLE / sb.n), 6)
                     AS max_containment
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE greatest(i::DOUBLE / sa.n, i::DOUBLE / sb.n) >= 0.01
            ORDER BY id_a, id_b
        """,
        "edit_sim": r"""
            WITH t AS (
              SELECT doc_id,
                     left(regexp_replace(lower(trim(text)),
                                         '\s+', ' ', 'g'), 600) AS t,
                     length(regexp_replace(lower(trim(text)),
                                           '\s+', ' ', 'g')) > 600 AS trunc
              FROM documents WHERE doc_id < 40 AND text IS NOT NULL),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     levenshtein(a.t, b.t) AS lev,
                     greatest(length(a.t), length(b.t)) AS lng,
                     (a.trunc OR b.trunc) AS truncated
              FROM t a JOIN t b ON a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   round(CASE WHEN lng = 0 THEN 1.0
                         ELSE 1 - lev::DOUBLE / lng END, 6) AS edit_sim,
                   truncated::INT AS truncated
            FROM p
            WHERE (CASE WHEN lng = 0 THEN 1.0
                   ELSE 1 - lev::DOUBLE / lng END) >= 0.05
            ORDER BY id_a, id_b
        """,
        "token_budget": r"""
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     sum(coalesce(n_chars, 0)) OVER (
                       ORDER BY md5('42|' || doc_id::VARCHAR), doc_id)
                       AS cum
              FROM documents)
            WHERE cum <= 20000 ORDER BY doc_id
        """,
        "train_order": r"""
            SELECT doc_id,
                   ((('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 8))
                     ::BIGINT) % 16)::INT AS shard,
                   row_number() OVER (
                     PARTITION BY (('0x' || substr(
                         md5('42|' || doc_id::VARCHAR), 1, 8))::BIGINT) % 16
                     ORDER BY md5('42|' || doc_id::VARCHAR),
                              doc_id::VARCHAR)::BIGINT AS pos
            FROM documents ORDER BY doc_id
        """,
        "budget_mix": r"""
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     sum(coalesce(n_chars, 0)) OVER (
                       PARTITION BY source
                       ORDER BY md5('42|' || doc_id::VARCHAR), doc_id)
                       AS cum
              FROM documents WHERE source IN ('src0', 'src1', 'src2'))
            WHERE cum <= CASE source WHEN 'src0' THEN 3000
                                     WHEN 'src1' THEN 2000
                                     ELSE 1000 END
            ORDER BY doc_id
        """,
        "ccnet_mix": r"""
            WITH rw AS (
              SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS w
              FROM documents
              WHERE text IS NOT NULL AND doc_id % 2 = 1),
            cnt AS (
              SELECT w, count(*) AS c FROM rw WHERE w <> '' GROUP BY w),
            tot AS (
              SELECT count(*) AS n FROM rw WHERE w <> ''),
            dw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS w
              FROM documents
              WHERE text IS NOT NULL AND doc_id % 2 = 0),
            scored AS (
              SELECT d.doc_id, cnt.c, tot.n
              FROM dw d LEFT JOIN cnt USING (w) CROSS JOIN tot
              WHERE d.w <> ''),
            wts AS (
              SELECT doc_id,
                     round(avg(log2(coalesce(c::DOUBLE, 0.5) / n)), 6)
                       AS avg_logprob
              FROM scored GROUP BY doc_id),
            bkt AS (
              SELECT doc_id, avg_logprob,
                     CASE WHEN avg_logprob >= -4.91 THEN 0
                          WHEN avg_logprob >= -4.92 THEN 1
                          ELSE 2 END AS bucket
              FROM wts)
            SELECT doc_id, bucket::INT AS bucket, avg_logprob
            FROM bkt
            WHERE substr(md5('42|' || doc_id::VARCHAR), 1, 8)
                  < CASE WHEN bucket = 0 THEN 'gggggggg'
                         WHEN bucket = 1 THEN '80000000'
                         ELSE '19999999' END
            ORDER BY doc_id
        """,
        "dsir_select": r"""
            WITH raw AS (
              SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
            tw AS (
              SELECT unnest(string_split_regex(lower(trim(r.text)), '\s+'))
                       AS w
              FROM raw r JOIN documents d USING (doc_id)
              WHERE d.lang = 'en'),
            tcnt AS (
              SELECT w, count(*) AS c_t FROM tw WHERE w <> '' GROUP BY w),
            tn AS (SELECT sum(c_t) AS n_t FROM tcnt),
            rw AS (
              SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS w FROM raw),
            rcnt AS (
              SELECT w, count(*) AS c_r FROM rw WHERE w <> '' GROUP BY w),
            rn AS (SELECT sum(c_r) AS n_r FROM rcnt),
            voc AS (
              SELECT count(*) AS v FROM (
                SELECT w FROM tcnt UNION SELECT w FROM rcnt)),
            dw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS w
              FROM raw),
            scored AS (
              SELECT d.doc_id, tcnt.c_t, rcnt.c_r, tn.n_t, rn.n_r, voc.v
              FROM dw d LEFT JOIN tcnt USING (w) LEFT JOIN rcnt USING (w)
              CROSS JOIN tn CROSS JOIN rn CROSS JOIN voc
              WHERE d.w <> ''),
            wts AS (
              SELECT doc_id, count(*)::BIGINT AS n_words,
                     round(avg(log2((coalesce(c_t, 0) + 0.5)
                                    / (n_t + 0.5 * v))
                               - log2((coalesce(c_r, 1) + 0.5)
                                      / (n_r + 0.5 * v))), 6)
                       AS log_weight
              FROM scored GROUP BY doc_id),
            keyed AS (
              SELECT doc_id, n_words, log_weight,
                     round(log_weight / 0.2
                           - ln(-ln((('0x' || substr(
                                 md5('42|' || doc_id::VARCHAR), 1, 8))
                                 ::BIGINT + 0.5) / 4294967296.0)), 6)
                       AS sample_key
              FROM wts)
            SELECT doc_id, n_words, log_weight, sample_key
            FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 50
        """,
        "span_cut": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents WHERE text IS NOT NULL),
            g AS (
              SELECT doc_id,
                     unnest(generate_series(1, greatest(len(ws) - 7, 0)))
                       - 1 AS pos,
                     unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 7, 0)),
                       i -> array_to_string(ws[i:i+7], ' '))) AS gram
              FROM w),
            rn AS (
              SELECT doc_id, pos, gram,
                     row_number() OVER (PARTITION BY gram
                                        ORDER BY doc_id, pos) AS rn
              FROM g),
            dup AS (
              SELECT gram FROM g
              GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
            hits AS (
              SELECT r.doc_id, r.pos, (r.rn = 1) AS isf
              FROM rn r JOIN dup USING (gram)),
            isl AS (
              SELECT doc_id, pos, isf,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM hits),
            spans AS (
              SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e,
                     max(isf) AS keep
              FROM isl GROUP BY doc_id, grp),
            dropped AS (
              SELECT doc_id, unnest(generate_series(s, e)) AS pos
              FROM spans WHERE NOT keep),
            raw AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS rws
              FROM documents WHERE text IS NOT NULL),
            pw AS (
              SELECT doc_id, unnest(generate_series(1, len(rws))) - 1
                       AS pos,
                     unnest(rws) AS word
              FROM raw),
            kept AS (
              SELECT p.doc_id, p.pos, p.word
              FROM pw p LEFT JOIN dropped d
                ON p.doc_id = d.doc_id AND p.pos = d.pos
              WHERE d.pos IS NULL),
            reb AS (
              SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text,
                     count(*) AS nw
              FROM kept GROUP BY doc_id)
            SELECT r.doc_id, coalesce(k.text, '') AS text,
                   coalesce(k.nw, 0)::BIGINT AS n_words,
                   (len(r.rws) - coalesce(k.nw, 0))::BIGINT
                     AS n_words_removed
            FROM raw r LEFT JOIN reb k USING (doc_id)
            ORDER BY r.doc_id
        """,
        "doc_logprob": r"""
            WITH rw AS (
              SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS w
              FROM documents
              WHERE text IS NOT NULL AND doc_id % 2 = 1),
            cnt AS (
              SELECT w, count(*) AS c FROM rw WHERE w <> '' GROUP BY w),
            tot AS (
              SELECT count(*) AS n FROM rw WHERE w <> ''),
            dw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS w
              FROM documents
              WHERE text IS NOT NULL AND doc_id % 2 = 0),
            scored AS (
              SELECT d.doc_id, cnt.c, tot.n
              FROM dw d LEFT JOIN cnt USING (w) CROSS JOIN tot
              WHERE d.w <> '')
            SELECT doc_id, count(*)::BIGINT AS n_words,
                   round(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 6) AS oov_fraction,
                   round(avg(log2(coalesce(c::DOUBLE, 0.5) / n)), 6)
                     AS avg_logprob
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        "src_entropy": r"""
            WITH pv AS (
              SELECT source, lang, count(*) AS c
              FROM documents WHERE lang IS NOT NULL
              GROUP BY source, lang)
            SELECT source, sum(c)::BIGINT AS n,
                   count(*)::BIGINT AS n_distinct,
                   round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6)
                     AS entropy
            FROM pv GROUP BY source ORDER BY source
        """,
        "para_dedup": r"""
            WITH base AS (
              SELECT doc_id,
                     string_split(regexp_replace(text, ' +', chr(10), 'g'),
                                  chr(10)) AS ls
              FROM documents WHERE text IS NOT NULL AND text <> ''
            ), ex AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(ls))) AS pos,
                     unnest(ls) AS line
              FROM base
            ), surv AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos, row_number() OVER (
                  PARTITION BY trim(line) ORDER BY doc_id, pos) AS rn
                FROM ex WHERE length(trim(line)) >= 4)
              WHERE rn = 1
            )
            SELECT e.doc_id,
                   CAST(count(*) FILTER (WHERE length(trim(e.line)) < 4
                                            OR s.pos IS NOT NULL)
                        AS BIGINT) AS n_lines,
                   CAST(count(*) FILTER (WHERE length(trim(e.line)) >= 4
                                           AND s.pos IS NULL)
                        AS BIGINT) AS n_removed
            FROM ex e LEFT JOIN surv s
              ON s.doc_id = e.doc_id AND s.pos = e.pos
            GROUP BY e.doc_id ORDER BY e.doc_id
        """,
        "tokenized_stats": r"""
            SELECT source, count(*)::BIGINT AS n_docs,
                   CAST(sum(len(regexp_extract_all(text,
                        '[A-Za-z]{1,4}|\d|[^\w\s]'))) AS BIGINT)
                       AS total_tokens,
                   CAST(max(len(regexp_extract_all(text,
                        '[A-Za-z]{1,4}|\d|[^\w\s]'))) AS INT) AS max_tokens
            FROM documents GROUP BY source ORDER BY source
        """,
        "incremental_new": r"""
            WITH d AS (
              SELECT doc_id,
                     md5(regexp_replace(lower(trim(substr(text, 1, 20))),
                                        '\s+', ' ', 'g')) AS fp
              FROM documents)
            SELECT n.doc_id FROM d n
            WHERE n.doc_id % 3 = 0
              AND NOT EXISTS (SELECT 1 FROM d r
                              WHERE r.doc_id % 3 <> 0 AND r.fp = n.fp)
            ORDER BY n.doc_id
        """,
        "dedup_keep": """
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY md5(regexp_replace(lower(trim(substr(text, 1, 20))),
                                                '\\s+', ' ', 'g'))
                ORDER BY doc_id) AS rn
              FROM documents)
            WHERE rn = 1 ORDER BY doc_id
        """,
        "dedup_best": """
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY md5(regexp_replace(lower(trim(substr(text, 1, 20))),
                                                '\\s+', ' ', 'g'))
                ORDER BY n_chars DESC NULLS LAST, doc_id) AS rn
              FROM documents)
            WHERE rn = 1 ORDER BY doc_id
        """,
        "text_profile": f"""
            WITH p AS (
              SELECT text, length(text) AS n_chars,
                     regexp_extract_all(lower(trim(text)), '\\S+') AS w
              FROM documents
            ), q AS (
              SELECT *, length(w) AS n_words,
                greatest(length(w), 1)::DOUBLE AS nw1,
                length(list_filter(w, x -> x IN ({_textstats_sql_bits()['en']})))::DOUBLE AS c_en,
                length(list_filter(w, x -> x IN ({_textstats_sql_bits()['de']})))::DOUBLE AS c_de,
                length(list_filter(w, x -> x IN ({_textstats_sql_bits()['fr']})))::DOUBLE AS c_fr,
                length(list_filter(w, x -> x IN ({_textstats_sql_bits()['es']})))::DOUBLE AS c_es
              FROM p
            ), s AS (
              SELECT *,
                c_en/nw1 AS h_en, c_de/nw1 AS h_de,
                c_fr/nw1 AS h_fr, c_es/nw1 AS h_es,
                CASE WHEN text IS NULL THEN 'unknown'
                     WHEN n_chars > 0 AND
                     length(regexp_extract_all(text, '[一-鿿぀-ヿ]'))::DOUBLE / n_chars > 0.25
                     THEN 'zh'
                     WHEN greatest(c_en/nw1, c_de/nw1, c_fr/nw1, c_es/nw1) <= 0 THEN 'unknown'
                     WHEN c_en/nw1 >= greatest(c_de/nw1, c_fr/nw1, c_es/nw1) THEN 'en'
                     WHEN c_de/nw1 >= greatest(c_fr/nw1, c_es/nw1) THEN 'de'
                     WHEN c_fr/nw1 >= c_es/nw1 THEN 'fr'
                     ELSE 'es' END AS lang_detected,
                (CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1.0 ELSE 0.3 END)
                * (CASE WHEN n_words > 0 AND n_chars::DOUBLE/n_words >= 3
                          AND n_chars::DOUBLE/n_words <= 12 THEN 1.0 ELSE 0.5 END)
                * (CASE WHEN (CASE WHEN n_chars > 0
                     THEN length(regexp_extract_all(text, '[[:punct:]]'))::DOUBLE/n_chars
                     ELSE 0 END) <= 0.2 THEN 1.0 ELSE 0.5 END)
                * (CASE WHEN (CASE WHEN n_chars > 0
                     THEN length(regexp_extract_all(text, '[0-9]'))::DOUBLE/n_chars
                     ELSE 0 END) <= 0.3 THEN 1.0 ELSE 0.6 END)
                * (CASE WHEN (CASE WHEN n_words > 0
                     THEN length(list_distinct(w))::DOUBLE/n_words
                     ELSE 0 END) >= 0.3 THEN 1.0 ELSE 0.4 END) AS quality
              FROM q
            )
            SELECT lang_detected, count(*)::BIGINT AS n_docs,
                   round(avg(quality), 4) AS avg_quality
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "token_counts": r"""
            SELECT count(*)::BIGINT AS n_docs,
                   CAST(sum(length(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
                   round(avg(length(regexp_extract_all(text, '\S+'))), 4) AS avg_tokens
            FROM documents
        """,
        "lang_hist": """
            SELECT lang, count(*)::BIGINT AS n_docs,
                   round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 6) AS share
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "ann_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
                 s AS (
                   SELECT vec_id,
                          list_sum(list_transform(range(1, 65),
                              i -> embedding[i]::DOUBLE * qe[i]::DOUBLE)) /
                          (sqrt(list_sum(list_transform(range(1, 65),
                              i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
                           * sqrt(list_sum(list_transform(range(1, 65),
                              i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))) AS cos
                   FROM embeddings, q WHERE vec_id <> 0
                 )
            SELECT vec_id, round(cos, 6) AS cosine
            FROM s ORDER BY cos DESC, vec_id LIMIT 10
        """,
        "embedding_stats": """
            SELECT count(*)::BIGINT AS n_vectors,
                   min(len(embedding)) AS min_dim,
                   max(len(embedding)) AS max_dim,
                   round(avg(sqrt(list_sum(list_transform(embedding,
                         x -> x::DOUBLE * x::DOUBLE)))), 4) AS avg_norm
            FROM embeddings
        """,
        "doc_profile": """
            WITH m AS (
              SELECT 'doc_id' AS col, count(*)::BIGINT AS n_rows,
                     CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                     min(doc_id)::DOUBLE AS mn, max(doc_id)::DOUBLE AS mx,
                     avg(doc_id) AS av
              FROM documents
              UNION ALL
              SELECT 'text', count(*)::BIGINT,
                     CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT),
                     min(length(text))::DOUBLE, max(length(text))::DOUBLE,
                     avg(length(text))
              FROM documents
              UNION ALL
              SELECT 'lang', count(*)::BIGINT,
                     CAST(sum(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) AS BIGINT),
                     min(length(lang))::DOUBLE, max(length(lang))::DOUBLE,
                     avg(length(lang))
              FROM documents
              UNION ALL
              SELECT 'n_chars', count(*)::BIGINT,
                     CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                     min(n_chars)::DOUBLE, max(n_chars)::DOUBLE, avg(n_chars)
              FROM documents
            )
            SELECT col AS "column", n_rows, n_nulls,
                   round(n_nulls::DOUBLE / n_rows, 6) AS null_rate,
                   round(mn, 4) AS min_v, round(mx, 4) AS max_v,
                   round(av, 4) AS avg_v
            FROM m ORDER BY col
        """,
        "chars_quantiles": """
            SELECT round(quantile_cont(n_chars, 0.0), 4) AS q0,
                   round(quantile_cont(n_chars, 0.25), 4) AS q1,
                   round(quantile_cont(n_chars, 0.5), 4) AS q2,
                   round(quantile_cont(n_chars, 0.75), 4) AS q3,
                   round(quantile_cont(n_chars, 1.0), 4) AS q4
            FROM documents
        """,
        "orphan_rows": """
            SELECT o.o_orderkey, 'o_custkey.referential' AS rule_id,
                   'o_custkey' AS position,
                   'value not present in dimension o_custkey' AS message,
                   o.o_custkey::VARCHAR AS value
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
            ORDER BY o.o_orderkey
        """,
        "dup_keys_salted": """
            SELECT doc_id, count(*)::BIGINT AS n_occurrences
            FROM documents GROUP BY doc_id HAVING count(*) > 1
            ORDER BY doc_id
        """,
        "scalar_net_violations": f"""
            WITH c AS (SELECT * FROM {_values_sql(_NET_ROWS, _NET_COLS)}),
            v AS (
              SELECT rid, ip, host, uid, link, mail, tel, tag, idc,
                CASE WHEN ip IS NOT NULL AND ip <> '' AND NOT
                  regexp_full_match(trim(ip),
                    '((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){{3}}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])')
                  THEN 'ip.ipv4' END AS r_ip,
                CASE WHEN host IS NOT NULL AND host <> '' AND NOT (
                  regexp_full_match(regexp_replace(trim(host), '\\.$', ''),
                    '([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9-]{{0,61}}[A-Za-z0-9])(\\.([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9-]{{0,61}}[A-Za-z0-9]))+')
                  AND length(regexp_replace(trim(host), '\\.$', '')) <= 253)
                  THEN 'host.fqdn' END AS r_host,
                CASE WHEN uid IS NOT NULL AND uid <> '' AND NOT
                  regexp_full_match(
                    replace(replace(regexp_replace(trim(uid), '^(urn:uuid:)', ''), '{{', ''), '}}', ''),
                    '[0-9a-fA-F]{{8}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{12}}')
                  THEN 'uid.uuid' END AS r_uid,
                CASE WHEN link IS NULL OR link = '' THEN NULL
                     WHEN length(trim(link)) > 255 THEN 'link.maxlen'
                     WHEN lower(regexp_extract(trim(link), '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) <> 'https'
                       THEN 'link.scheme' END AS r_link,
                CASE WHEN mail IS NOT NULL AND mail <> '' AND NOT
                  regexp_full_match(mail, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')
                  THEN 'mail.email' END AS r_mail,
                CASE WHEN tel IS NULL OR tel = '' THEN NULL
                     WHEN length(tel) > 15 THEN 'tel.maxlen'
                     WHEN NOT regexp_full_match(tel, '((\\+[0-9]{{2}}\\s?)|([0-9]{{2}}\\s?))?1[0-9]{{10}}')
                       THEN 'tel.phone' END AS r_tel,
                CASE WHEN tag IS NOT NULL AND tag <> '' AND NOT
                  regexp_full_match(tag, '[a-z0-9]+(?:-[a-z0-9]+)*')
                  THEN 'tag.slug' END AS r_tag,
                CASE WHEN idc IS NOT NULL AND idc <> '' AND NOT
                  regexp_full_match(idc, '([0-9]{{17}}[0-9xX])|([0-9]{{15}})')
                  THEN 'idc.idcard' END AS r_idc
              FROM c
            )
            SELECT rid, r_ip AS rule_id, 'ip' AS position,
                   'invalid ipv4 address' AS message,
                   '''' || ip || '''' AS value
              FROM v WHERE r_ip IS NOT NULL
            UNION ALL
            SELECT rid, r_host, 'host', 'invalid fqdn', '''' || host || ''''
              FROM v WHERE r_host IS NOT NULL
            UNION ALL
            SELECT rid, r_uid, 'uid', 'invalid uuid', '''' || uid || ''''
              FROM v WHERE r_uid IS NOT NULL
            UNION ALL
            SELECT rid, r_link, 'link',
                   CASE r_link WHEN 'link.maxlen' THEN 'url length must <= 255'
                        ELSE 'invalid url scheme, expect {{''https''}}' END,
                   CASE WHEN length(link) > 75
                        THEN '''' || substr(link, 1, 75) || '..'''
                        ELSE '''' || link || '''' END
              FROM v WHERE r_link IS NOT NULL
            UNION ALL
            SELECT rid, r_mail, 'mail',
                   CASE WHEN length(mail) - length(replace(mail, '@', '')) <> 1
                        THEN 'The email address is not valid. It must have exactly one @-sign.'
                        WHEN mail LIKE '@%' THEN 'There must be something before the @-sign.'
                        ELSE 'invalid email address' END,
                   '''' || mail || ''''
              FROM v WHERE r_mail IS NOT NULL
            UNION ALL
            SELECT rid, r_tel, 'tel',
                   CASE r_tel WHEN 'tel.maxlen' THEN 'phone length must <= 15'
                        ELSE 'invalid phone' END,
                   '''' || tel || ''''
              FROM v WHERE r_tel IS NOT NULL
            UNION ALL
            SELECT rid, r_tag, 'tag', 'invalid slug', '''' || tag || ''''
              FROM v WHERE r_tag IS NOT NULL
            UNION ALL
            SELECT rid, r_idc, 'idc', 'invalid idcard', '''' || idc || ''''
              FROM v WHERE r_idc IS NOT NULL
            ORDER BY rid, rule_id
        """,
        "scalar_net_coerced": f"""
            WITH c AS (SELECT * FROM {_values_sql(_NET_ROWS, _NET_COLS)}),
            u AS (
              SELECT *,
                replace(replace(regexp_replace(trim(uid), '^(urn:uuid:)', ''), '{{', ''), '}}', '') AS uid_stripped,
                lower(replace(replace(replace(regexp_replace(trim(uid), '^(urn:uuid:)', ''), '{{', ''), '}}', ''), '-', '')) AS uid_hex,
                regexp_replace(trim(host), '\\.$', '') AS host_rel
              FROM c
            )
            SELECT rid,
              CASE WHEN ip IS NULL OR ip = '' THEN ''
                   WHEN regexp_full_match(trim(ip),
                     '((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){{3}}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])')
                   THEN trim(ip) ELSE '' END AS ip,
              CASE WHEN host IS NULL OR host = '' THEN ''
                   WHEN regexp_full_match(host_rel,
                     '([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9-]{{0,61}}[A-Za-z0-9])(\\.([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9-]{{0,61}}[A-Za-z0-9]))+')
                     AND length(host_rel) <= 253
                   THEN host_rel ELSE '' END AS host,
              CASE WHEN uid IS NULL OR uid = '' THEN ''
                   WHEN regexp_full_match(uid_stripped,
                     '[0-9a-fA-F]{{8}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{12}}')
                   THEN substr(uid_hex, 1, 8) || '-' || substr(uid_hex, 9, 4)
                     || '-' || substr(uid_hex, 13, 4) || '-'
                     || substr(uid_hex, 17, 4) || '-' || substr(uid_hex, 21, 12)
                   ELSE '' END AS uid,
              CASE WHEN link IS NULL OR link = '' THEN ''
                   WHEN length(trim(link)) <= 255
                     AND lower(regexp_extract(trim(link), '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) = 'https'
                   THEN trim(link) ELSE '' END AS link,
              CASE WHEN mail IS NULL OR mail = '' THEN ''
                   WHEN regexp_full_match(mail, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')
                   THEN mail ELSE '' END AS mail,
              CASE WHEN tel IS NULL OR tel = '' THEN ''
                   WHEN length(tel) <= 15
                     AND regexp_full_match(tel, '((\\+[0-9]{{2}}\\s?)|([0-9]{{2}}\\s?))?1[0-9]{{10}}')
                   THEN tel ELSE '' END AS tel,
              CASE WHEN tag IS NULL OR tag = '' THEN ''
                   WHEN regexp_full_match(tag, '[a-z0-9]+(?:-[a-z0-9]+)*')
                   THEN tag ELSE '' END AS tag,
              CASE WHEN idc IS NULL OR idc = '' THEN ''
                   WHEN regexp_full_match(idc, '([0-9]{{17}}[0-9xX])|([0-9]{{15}})')
                   THEN idc ELSE '' END AS idc,
              concat_ws(',',
                CASE WHEN ip IS NOT NULL AND ip <> '' AND NOT regexp_full_match(trim(ip), '((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){{3}}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])') THEN 'ip.ipv4' END,
                CASE WHEN host IS NOT NULL AND host <> '' AND NOT (regexp_full_match(host_rel, '([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9-]{{0,61}}[A-Za-z0-9])(\\.([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9-]{{0,61}}[A-Za-z0-9]))+') AND length(host_rel) <= 253) THEN 'host.fqdn' END,
                CASE WHEN uid IS NOT NULL AND uid <> '' AND NOT regexp_full_match(uid_stripped, '[0-9a-fA-F]{{8}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{4}}-?[0-9a-fA-F]{{12}}') THEN 'uid.uuid' END,
                CASE WHEN link IS NULL OR link = '' THEN NULL
                     WHEN length(trim(link)) > 255 THEN 'link.maxlen'
                     WHEN lower(regexp_extract(trim(link), '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) <> 'https' THEN 'link.scheme' END,
                CASE WHEN mail IS NOT NULL AND mail <> '' AND NOT regexp_full_match(mail, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}') THEN 'mail.email' END,
                CASE WHEN tel IS NULL OR tel = '' THEN NULL
                     WHEN length(tel) > 15 THEN 'tel.maxlen'
                     WHEN NOT regexp_full_match(tel, '((\\+[0-9]{{2}}\\s?)|([0-9]{{2}}\\s?))?1[0-9]{{10}}') THEN 'tel.phone' END,
                CASE WHEN tag IS NOT NULL AND tag <> '' AND NOT regexp_full_match(tag, '[a-z0-9]+(?:-[a-z0-9]+)*') THEN 'tag.slug' END,
                CASE WHEN idc IS NOT NULL AND idc <> '' AND NOT regexp_full_match(idc, '([0-9]{{17}}[0-9xX])|([0-9]{{15}})') THEN 'idc.idcard' END
              ) AS rules
            FROM u
            ORDER BY rid
        """,
        "scalar_temporal": f"""
            WITH c AS (SELECT * FROM
              {_values_sql(_TEMPORAL_ROWS, _TEMPORAL_COLS)}),
            p AS (
              SELECT *,
                CASE WHEN regexp_extract(dt, '\\.([0-9]{{1,6}})Z$', 1) <> ''
                     THEN regexp_replace(dt, '\\.[0-9]+Z$',
                       '.' || rpad(regexp_extract(dt, '\\.([0-9]{{1,6}})Z$', 1), 6, '0') || 'Z')
                     ELSE dt END AS dt_pad
              FROM c
            ), q AS (
              SELECT *,
                try_strptime(d, '%Y-%m-%d') AS d_ts,
                try_strptime(t, '%H:%M:%S') AS t_ts,
                try_strptime(dt_pad, '%Y-%m-%dT%H:%M:%S.%fZ') AS dt_ts,
                CASE WHEN td IS NULL OR td = '' THEN NULL
                     WHEN regexp_full_match(td, '-?[0-9.]+(ns|us|ms|s|m|h|d)')
                     THEN (CASE WHEN td LIKE '-%' THEN -1 ELSE 1 END)
                       * TRY_CAST(regexp_extract(td, '([0-9.]+)', 1) AS DOUBLE)
                       * (CASE regexp_extract(td, '([a-z]+)$', 1)
                            WHEN 'ns' THEN 0.000000001 WHEN 'us' THEN 0.000001
                            WHEN 'ms' THEN 0.001 WHEN 's' THEN 1
                            WHEN 'm' THEN 60 WHEN 'h' THEN 3600
                            WHEN 'd' THEN 86400 END)
                     END AS td_sec
              FROM p
            )
            SELECT rid,
              CASE WHEN d IS NULL OR d = '' THEN ''
                   ELSE coalesce(strftime(d_ts, '%Y-%m-%d'), '') END AS d,
              CASE WHEN t IS NULL OR t = '' THEN ''
                   ELSE coalesce(strftime(t_ts, '%H:%M:%S'), '') END AS t,
              CASE WHEN dt IS NULL OR dt = '' THEN ''
                   ELSE coalesce(strftime(dt_ts, '%Y-%m-%dT%H:%M:%S.%fZ'), '') END AS dt,
              round(td_sec, 6) AS td,
              CASE WHEN flag IS NULL OR flag = '' THEN NULL
                   WHEN flag IN ('1','ON','On','TRUE','True','Y','YES','Yes','on','true','y','yes') THEN true
                   WHEN flag IN ('0','FALSE','False','N','NO','No','OFF','Off','false','n','no','off') THEN false
                   END AS flag,
              concat_ws(',',
                CASE WHEN d IS NOT NULL AND d <> '' AND d_ts IS NULL THEN 'd.date' END,
                CASE WHEN t IS NOT NULL AND t <> '' AND t_ts IS NULL THEN 't.time' END,
                CASE WHEN dt IS NOT NULL AND dt <> '' AND dt_ts IS NULL THEN 'dt.datetime' END,
                CASE WHEN td IS NOT NULL AND td <> '' AND td_sec IS NULL THEN 'td.timedelta' END,
                CASE WHEN flag IS NOT NULL AND flag <> ''
                       AND flag NOT IN ('1','ON','On','TRUE','True','Y','YES','Yes','on','true','y','yes',
                                        '0','FALSE','False','N','NO','No','OFF','Off','false','n','no','off')
                     THEN 'flag.type' END
              ) AS rules
            FROM q
            ORDER BY rid
        """,
        "scalar_strnum": f"""
            WITH c AS (SELECT * FROM
              {_values_sql(_STRNUM_ROWS, _STRNUM_COLS)})
            SELECT rid,
              CASE WHEN s IS NULL OR s = '' THEN ''
                   ELSE replace(replace(replace(replace(replace(trim(s),
                     '&', '&amp;'), '>', '&gt;'), '<', '&lt;'),
                     '''', '&#39;'), '"', '&#34;') END AS s,
              CASE WHEN m IS NULL OR m = '' THEN ''
                   WHEN regexp_full_match(m, '[a-z]+') THEN m ELSE '' END AS m,
              CASE WHEN i IS NULL OR i = '' THEN NULL
                   WHEN regexp_full_match(i, '\\s*[+-]?[0-9]+\\s*')
                   THEN TRY_CAST(trim(i) AS BIGINT) END AS i,
              CASE WHEN f IS NULL OR f = '' THEN NULL
                   WHEN TRY_CAST(f AS DOUBLE) IS NULL THEN NULL
                   WHEN TRY_CAST(f AS DOUBLE) <= 0 THEN NULL
                   ELSE round(TRY_CAST(f AS DOUBLE), 6) END AS f,
              CASE WHEN ns IS NULL THEN NULL ELSE ns END AS ns,
              concat_ws(',',
                CASE WHEN m IS NOT NULL AND m <> ''
                       AND NOT regexp_full_match(m, '[a-z]+')
                     THEN 'm.match' END,
                CASE WHEN i IS NOT NULL AND i <> ''
                       AND NOT regexp_full_match(i, '\\s*[+-]?[0-9]+\\s*')
                     THEN 'i.type' END,
                CASE WHEN f IS NULL OR f = '' THEN NULL
                     WHEN TRY_CAST(f AS DOUBLE) IS NULL THEN 'f.type'
                     WHEN TRY_CAST(f AS DOUBLE) <= 0 THEN 'f.min' END
              ) AS rules
            FROM c
            ORDER BY rid
        """,
        "events_validate": f"""
            WITH v AS (
              SELECT
                CASE WHEN event_type NOT IN ('click','view','signup','error')
                     THEN 'event_type.enum' END AS r1,
                CASE WHEN value < 0 THEN 'value.min'
                     WHEN value > 450 THEN 'value.max' END AS r2,
                CASE WHEN user_id < 0 THEN 'user_id.min' END AS r3
              FROM events
            ), u AS (
              SELECT r1 AS rule_id FROM v WHERE r1 IS NOT NULL
              UNION ALL SELECT r2 FROM v WHERE r2 IS NOT NULL
              UNION ALL SELECT r3 FROM v WHERE r3 IS NOT NULL
            )
            SELECT rule_id, count(*)::BIGINT AS n_violations
            FROM u GROUP BY rule_id ORDER BY rule_id
        """,
        **_pipeline_oracles(),
    }


def _pipeline_oracles() -> dict[str, str]:
    """Oracles for the sampling / PII / repetition pipeline queries.

    The sampling thresholds are computed by the SAME helper the engine
    uses (fraction_threshold), so engine and oracle agree by construction
    on the md5-prefix interval layout."""
    from validr_spark.operators.pii import PII_PATTERNS
    from validr_spark.operators.sampling import fraction_threshold

    doc_src_list = ", ".join(repr(s) for s in DOC_SOURCES)
    t_train = fraction_threshold(0.8)
    t_val = fraction_threshold(0.9)            # cumulative train+val
    mix_case = " ".join(
        f"WHEN source = '{s}' THEN '{fraction_threshold(r)}'"
        for s, r in [("src0", 1.0), ("src1", 0.5), ("src2", 0.25)])
    t_default = fraction_threshold(0.1)
    hp = "substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8)"

    pii_cnt = ", ".join(
        "len(regexp_extract_all(text, '%s'))::INT AS n_%s"
        % (p.replace("'", "''"), n) for n, p in PII_PATTERNS.items())
    pii_tot = " + ".join(f"n_{n}" for n in PII_PATTERNS)

    from validr_spark.operators.encoding import ENCODING_PATTERNS
    enc_cnt = ", ".join(
        "len(regexp_extract_all(text, '%s'))::INT AS c_%s"
        % (p.replace("'", "''"), n) for n, p in ENCODING_PATTERNS.items())
    enc_tot = " + ".join(f"c_{n}" for n in ENCODING_PATTERNS)
    enc_docs = ", ".join(
        "CAST(sum(CASE WHEN c_%s > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS docs_%s" % (n, n) for n in ENCODING_PATTERNS)
    uu = ("substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4)"
          " || '-' || substr(h,17,4) || '-' || substr(h,21,12)")

    return {
        "sample_split": f"""
            SELECT split, count(*)::BIGINT AS n FROM (
              SELECT CASE WHEN {hp} < '{t_train}' THEN 'train'
                          WHEN {hp} < '{t_val}' THEN 'val'
                          ELSE 'test' END AS split
              FROM documents)
            GROUP BY split ORDER BY split
        """,
        "sample_mix": f"""
            WITH kept AS (
              SELECT source FROM documents
              WHERE {hp} < CASE {mix_case} ELSE '{t_default}' END
            ), a AS (SELECT source, count(*) AS n_in FROM documents
                     GROUP BY source),
               b AS (SELECT source, count(*) AS n_kept FROM kept
                     GROUP BY source)
            SELECT a.source, a.n_in::BIGINT AS n_in,
                   coalesce(b.n_kept, 0)::BIGINT AS n_kept,
                   round(coalesce(b.n_kept, 0)::DOUBLE / a.n_in, 6) AS rate
            FROM a LEFT JOIN b ON a.source = b.source ORDER BY a.source
        """,
        "pii_audit": f"""
            WITH e AS (
              SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                text
                || CASE WHEN doc_id % 7 = 0 THEN ' mail user'
                     || CAST(doc_id AS VARCHAR) || '@example.com ok'
                   ELSE '' END
                || CASE WHEN doc_id % 11 = 0 THEN ' ip 10.'
                     || CAST(doc_id % 200 AS VARCHAR) || '.0.1 seen'
                   ELSE '' END
                || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     || ' end' ELSE '' END
                || CASE WHEN doc_id % 19 = 0 THEN ' call +12 345-6789 ok'
                   ELSE '' END
                || CASE WHEN doc_id % 23 = 0
                     THEN ' card 4111 1111 1111 1111 x' ELSE '' END AS text0
              FROM documents),
            e2 AS (
              SELECT doc_id, text0 || CASE WHEN doc_id % 17 = 0
                THEN ' id ' || {uu} || ' here' ELSE '' END AS text
              FROM e),
            c AS (SELECT doc_id, {pii_cnt} FROM e2),
            t AS (SELECT *, {pii_tot} AS n_pii FROM c)
            SELECT *, n_pii > 0 AS has_pii FROM t
            WHERE n_pii > 0 ORDER BY doc_id
        """,
        "repetition_topk": r"""
            WITH w AS (
              SELECT doc_id,
                string_split(regexp_replace(trim(text), '\s*\n\s*',
                             chr(10), 'g'), chr(10)) AS lines,
                regexp_split_to_array(lower(trim(text)), '\s+') AS words
              FROM documents)
            SELECT doc_id, len(lines)::INT AS n_lines,
              round(CASE WHEN len(lines) > 0
                THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
                ELSE 0 END, 6) AS dup_line_fraction,
              round(CASE WHEN len(words) > 0
                THEN 1.0 - len(list_distinct(words))::DOUBLE / len(words)
                ELSE 0 END, 6) AS dup_word_fraction
            FROM w ORDER BY dup_word_fraction DESC, doc_id LIMIT 10
        """,
        "top_ngram": r"""
            WITH w AS (
              SELECT doc_id, lang,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS words
              FROM documents),
            f AS (SELECT * FROM w WHERE len(words) >= 2),
            g AS (
              SELECT doc_id, lang,
                unnest(list_transform(generate_series(1, len(words) - 1),
                       i -> words[i] || ' ' || words[i + 1])) AS gram
              FROM f),
            pg AS (SELECT doc_id, lang, gram, count(*) AS cnt
                   FROM g GROUP BY ALL),
            pd AS (SELECT doc_id, lang, sum(cnt) AS n_ngrams,
                          max(cnt) AS top_cnt FROM pg GROUP BY ALL)
            SELECT lang, count(*)::BIGINT AS n_docs,
                   round(avg(round(top_cnt::DOUBLE / n_ngrams, 6)), 6)
                     AS avg_top2gram_frac,
                   CAST(max(top_cnt) AS BIGINT) AS max_top2gram_count
            FROM pd GROUP BY lang ORDER BY lang
        """,
        "quality_filter": r"""
            WITH w AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS words,
                     string_split(regexp_replace(trim(text), '\s*\n\s*',
                                  chr(10), 'g'), chr(10)) AS lines
              FROM documents),
            q AS (
              SELECT doc_id,
                length(text) AS n_chars, len(words) AS n_words,
                CASE WHEN len(words) > 0
                  THEN length(text)::DOUBLE / len(words) ELSE 0 END AS mwl,
                CASE WHEN length(text) > 0
                  THEN len(regexp_extract_all(text, '[[:punct:]]'))::DOUBLE
                       / length(text) ELSE 0 END AS punct_ratio,
                CASE WHEN length(text) > 0
                  THEN len(regexp_extract_all(text, '[0-9]'))::DOUBLE
                       / length(text) ELSE 0 END AS digit_ratio,
                CASE WHEN len(words) > 0
                  THEN len(list_distinct(words))::DOUBLE / len(words)
                  ELSE 0 END AS uwr,
                CASE WHEN len(lines) > 0
                  THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
                  ELSE 0 END AS dlf
              FROM w),
            r AS (
              SELECT doc_id, concat_ws(',',
                CASE WHEN n_words < 10 THEN 'too_few_words' END,
                CASE WHEN n_words > 100000 THEN 'too_many_words' END,
                CASE WHEN mwl < 3.0 OR mwl > 12.0 THEN 'mean_word_len' END,
                CASE WHEN punct_ratio > 0.2 THEN 'punct_ratio' END,
                CASE WHEN digit_ratio > 0.3 THEN 'digit_ratio' END,
                CASE WHEN uwr < 0.3 THEN 'unique_word_ratio' END,
                CASE WHEN dlf > 0.3 THEN 'dup_line_fraction' END
              ) AS reasons FROM q)
            SELECT reasons = '' AS keep, reasons,
                   count(*)::BIGINT AS n_docs
            FROM r GROUP BY keep, reasons ORDER BY keep, reasons
        """,
        "pipeline_prep": rf"""
            WITH clean AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IS NOT NULL AND doc_id >= 0
                AND text IS NOT NULL AND text <> ''
                AND length(text) BETWEEN 100 AND 2000
                AND lang IN ('en','de','fr','es')
                AND source IN ({doc_src_list})
                AND n_chars IS NOT NULL AND n_chars BETWEEN 50 AND 400
            ), ded AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text, row_number() OVER (
                  PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                  '\s+', ' ', 'g'))
                  ORDER BY doc_id) AS rn
                FROM clean) WHERE rn = 1
            ), w AS (
              SELECT doc_id, text, length(text) AS nch,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS words,
                     string_split(regexp_replace(trim(text), '\s*\n\s*',
                                  chr(10), 'g'), chr(10)) AS lines
              FROM ded
            ), q AS (
              SELECT doc_id, len(words) AS n_words,
                CASE WHEN len(words) > 0
                  THEN nch::DOUBLE / len(words) ELSE 0 END AS mwl,
                CASE WHEN nch > 0
                  THEN len(regexp_extract_all(text, '[[:punct:]]'))::DOUBLE
                       / nch ELSE 0 END AS punct_ratio,
                CASE WHEN nch > 0
                  THEN len(regexp_extract_all(text, '[0-9]'))::DOUBLE
                       / nch ELSE 0 END AS digit_ratio,
                CASE WHEN len(words) > 0
                  THEN len(list_distinct(words))::DOUBLE / len(words)
                  ELSE 0 END AS uwr,
                CASE WHEN len(lines) > 0
                  THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
                  ELSE 0 END AS dlf
              FROM w)
            SELECT doc_id FROM q
            WHERE n_words BETWEEN 10 AND 100000
              AND mwl BETWEEN 3.0 AND 12.0
              AND punct_ratio <= 0.2 AND digit_ratio <= 0.3
              AND uwr >= 0.3 AND dlf <= 0.3
            ORDER BY doc_id
        """,
        "token_hist": r"""
            SELECT token, count(*)::BIGINT AS n FROM (
              SELECT unnest(regexp_split_to_array(lower(trim(text)),
                            '\s+')) AS token
              FROM documents)
            GROUP BY token ORDER BY n DESC, token LIMIT 20
        """,
        "sessions": r"""
            WITH s AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts)/1000000.0
                          - epoch_us(lag(ts) OVER w)/1000000.0 > 1800
                     THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s2 AS (
              SELECT user_id, ts, sum(new_sess) OVER
                (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
                AS seq
              FROM s
            ), st AS (
              SELECT user_id, seq, count(*) AS n_events,
                     epoch_us(max(ts))/1000000.0
                     - epoch_us(min(ts))/1000000.0 AS dur
              FROM s2 GROUP BY 1, 2
            )
            SELECT n_events::BIGINT AS n_events,
                   count(*)::BIGINT AS n_sessions,
                   round(avg(dur), 6) AS avg_duration_sec
            FROM st GROUP BY n_events ORDER BY n_events
        """,
        "asof_clicks": r"""
            SELECT count(*)::BIGINT AS n_errors,
                   CAST(sum(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_matched,
                   round(avg(epoch_us(e.ts)/1000000.0
                             - epoch_us(c.ts)/1000000.0), 6) AS avg_lag_sec,
                   round(sum(c.value), 6) AS sum_click_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'error') e
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'click') c
              ON e.user_id = c.user_id AND e.ts >= c.ts
        """,
        "asof_forward": r"""
            SELECT count(*)::BIGINT AS n_errors,
                   CAST(sum(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_matched,
                   round(avg(epoch_us(c.ts)/1000000.0
                             - epoch_us(e.ts)/1000000.0), 6) AS avg_lead_sec,
                   round(sum(c.value), 6) AS sum_click_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'error') e
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'click') c
              ON e.user_id = c.user_id AND e.ts <= c.ts
        """,
        "map_validate": """
            WITH v AS (
              SELECT doc_id AS id, lang, source,
                     'k' || CAST(doc_id % 3 AS VARCHAR) AS k3,
                     repeat('v', (1 + doc_id % 5)::INT) AS v3
              FROM documents),
            r AS (
              SELECT id, lang, source, k3, v3, CASE
                -- per-dict fail-fast in map-entry order; key before value
                -- (minlen/maxlen split so a too-SHORT lang maps to the
                -- minlen rule, not the ELSE maxlen branch below)
                WHEN length(lang) < 2 THEN 'lang_minlen'
                WHEN length(lang) > 4 THEN 'lang_maxlen'
                WHEN length(source) < 2 THEN 'src_minlen'
                WHEN length(source) > 4 THEN 'src_maxlen'
                WHEN k3 NOT IN ('k0', 'lang', 'source') THEN 'key_enum'
                WHEN length(v3) < 2 THEN 'v_minlen'
                WHEN length(v3) > 4 THEN 'v_maxlen'
              END AS kind FROM v)
            SELECT id,
              CASE kind
                WHEN 'key_enum' THEN 'props.$self_key.enum'
                WHEN 'v_minlen' THEN 'props.$self_value.minlen'
                WHEN 'src_minlen' THEN 'props.$self_value.minlen'
                WHEN 'lang_minlen' THEN 'props.$self_value.minlen'
                ELSE 'props.$self_value.maxlen' END AS rule_id,
              CASE kind
                WHEN 'key_enum' THEN 'props.$self_key'
                WHEN 'src_maxlen' THEN 'props.source'
                WHEN 'src_minlen' THEN 'props.source'
                WHEN 'lang_minlen' THEN 'props.lang'
                WHEN 'lang_maxlen' THEN 'props.lang'
                ELSE 'props.k0' END AS position,
              CASE kind
                WHEN 'key_enum'
                  THEN 'expect one of {''k0'', ''lang'', ''source''}'
                WHEN 'v_minlen' THEN 'string length must >= 2'
                WHEN 'src_minlen' THEN 'string length must >= 2'
                WHEN 'lang_minlen' THEN 'string length must >= 2'
                ELSE 'string length must <= 4' END AS message,
              '''' || CASE kind
                WHEN 'key_enum' THEN k3
                WHEN 'src_maxlen' THEN source
                WHEN 'src_minlen' THEN source
                WHEN 'lang_minlen' THEN lang
                WHEN 'lang_maxlen' THEN lang
                ELSE v3 END || '''' AS value
            FROM r WHERE kind IS NOT NULL ORDER BY id, rule_id
        """,
        # passed gates on the RAW metric (CheckSuite.run contract);
        # observed is rounded to 4 for reporting, both engines alike
        "check_suite": f"""
            WITH m AS (
              SELECT count(*)::DOUBLE AS n_rows,
                sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0
                    END)::DOUBLE / count(*) AS null_rate,
                min(n_chars)::DOUBLE AS min_nc,
                max(n_chars)::DOUBLE AS max_nc,
                avg(n_chars) AS mean_nc,
                count(DISTINCT doc_id)::DOUBLE
                  / sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS uniq,
                sum(CASE WHEN lang IN ({{langs}}) THEN 1 ELSE 0
                    END)::DOUBLE
                  / sum(CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END)
                  AS lang_ratio,
                sum(CASE WHEN regexp_full_match(source, 'src\\d+')
                    THEN 1 ELSE 0 END)::DOUBLE
                  / sum(CASE WHEN source IS NOT NULL THEN 1 ELSE 0 END)
                  AS src_ratio,
                quantile_cont(n_chars, 0.5) AS med_nc,
                sum(CASE WHEN n_chars = length(text) THEN 1 ELSE 0
                    END)::DOUBLE / count(*) AS cons_ratio
              FROM documents)
            SELECT * FROM (
              SELECT 'row_count' AS check_id, CAST(NULL AS VARCHAR) AS "column",
                     round(n_rows, 4) AS observed, 1.0::DOUBLE AS lo,
                     CAST(NULL AS DOUBLE) AS hi, n_rows >= 1.0 AS passed FROM m
              UNION ALL SELECT 'null_rate(text)', 'text', round(null_rate, 4),
                     NULL, 0.05, null_rate <= 0.05 FROM m
              UNION ALL SELECT 'min(n_chars)', 'n_chars', round(min_nc, 4),
                     0.0, NULL, min_nc >= 0.0 FROM m
              UNION ALL SELECT 'max(n_chars)', 'n_chars', round(max_nc, 4),
                     NULL, 400.0, max_nc <= 400.0 FROM m
              UNION ALL SELECT 'mean(n_chars)', 'n_chars', round(mean_nc, 4),
                     50.0, 400.0, mean_nc >= 50.0 AND mean_nc <= 400.0 FROM m
              UNION ALL SELECT 'unique_ratio(doc_id,exact)', 'doc_id',
                     round(uniq, 4),
                     0.999, NULL, uniq >= 0.999 FROM m
              UNION ALL SELECT 'values_in(lang)', 'lang',
                     round(lang_ratio, 4),
                     0.95, NULL, lang_ratio >= 0.95 FROM m
              UNION ALL SELECT 'matches(source)', 'source',
                     round(src_ratio, 4),
                     1.0, NULL, src_ratio >= 1.0 FROM m
              UNION ALL SELECT 'q0.5(n_chars)', 'n_chars', round(med_nc, 4),
                     100.0, 400.0, med_nc >= 100.0 AND med_nc <= 400.0 FROM m
              UNION ALL SELECT 'n_chars_consistent', NULL,
                     round(cons_ratio, 4),
                     1.0, NULL, cons_ratio >= 1.0 FROM m
            ) ORDER BY check_id
        """.replace("{langs}",
                    ", ".join(repr(x) for x in DOC_LANGS)),
        "contamination": """
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents),
            grams AS (
              SELECT doc_id, unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 7, 0)),
                       i -> array_to_string(ws[i:i+7], ' '))) AS gram
              FROM w),
            bench AS (
              SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
            tot AS (
              SELECT doc_id,
                     greatest(len(ws) - 7, 0)::BIGINT AS n_grams FROM w),
            hits AS (
              SELECT g.doc_id, count(DISTINCT g.gram)::BIGINT AS n_hits
              FROM grams g JOIN bench USING (gram) GROUP BY g.doc_id)
            SELECT t.doc_id, t.n_grams,
                   coalesce(h.n_hits, 0)::BIGINT AS n_hits,
                   round(CASE WHEN t.n_grams > 0
                         THEN coalesce(h.n_hits, 0)::DOUBLE / t.n_grams
                         ELSE 0.0 END, 6) AS hit_fraction,
                   coalesce(h.n_hits, 0) >= 1 AS contaminated
            FROM tot t LEFT JOIN hits h USING (doc_id)
            ORDER BY t.doc_id
        """,
        "events_diff": """
            WITH ev AS (SELECT event_id, event_type, value FROM events),
            a AS (SELECT * FROM ev WHERE event_id % 7 != 1),
            b AS (SELECT event_id, event_type,
                         CASE WHEN event_id % 5 = 0 THEN value + 1.0
                              ELSE value END AS value
                  FROM ev WHERE event_id % 7 != 0)
            SELECT coalesce(a.event_id, b.event_id) AS event_id,
                   CASE WHEN a.event_id IS NULL THEN 'added'
                        WHEN b.event_id IS NULL THEN 'removed'
                        WHEN (a.event_type IS DISTINCT FROM b.event_type)
                          OR (a.value IS DISTINCT FROM b.value)
                          THEN 'changed'
                        ELSE 'same' END AS status,
                   CASE WHEN a.event_id IS NULL OR b.event_id IS NULL
                        THEN ''
                        ELSE concat_ws(',',
                          CASE WHEN a.event_type IS DISTINCT FROM
                                    b.event_type THEN 'event_type' END,
                          CASE WHEN a.value IS DISTINCT FROM b.value
                               THEN 'value' END) END AS changed
            FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
            ORDER BY event_id
        """,
        "dup_components": """
            WITH d AS (
              SELECT doc_id, min(lang) AS lang FROM documents GROUP BY doc_id),
            m AS (
              SELECT doc_id, lang,
                     CASE WHEN lag(doc_id) OVER (ORDER BY doc_id) = doc_id - 1
                           AND lag(lang)  OVER (ORDER BY doc_id) = lang
                          THEN 0 ELSE 1 END AS brk
              FROM d),
            g AS (
              SELECT doc_id,
                     sum(brk) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS grp
              FROM m)
            SELECT doc_id, min(doc_id) OVER (PARTITION BY grp) AS component
            FROM g ORDER BY doc_id
        """,
        "psi_drift": """
            WITH rng AS (
              SELECT min(value) AS lo, max(value) AS hi
              FROM events WHERE event_type = 'click'),
            rb AS (
              SELECT least(greatest(CAST(floor((e.value - r.lo)
                       / ((r.hi - r.lo) / 10)) AS INT), 0), 9) AS bin,
                     count(*)::BIGINT AS n_ref
              FROM events e, rng r
              WHERE e.event_type = 'click' AND e.value IS NOT NULL
              GROUP BY 1),
            nb AS (
              SELECT least(greatest(CAST(floor((e.value - r.lo)
                       / ((r.hi - r.lo) / 10)) AS INT), 0), 9) AS bin,
                     count(*)::BIGINT AS n_new
              FROM events e, rng r
              WHERE e.event_type = 'error' AND e.value IS NOT NULL
              GROUP BY 1),
            j AS (
              SELECT coalesce(rb.bin, nb.bin) AS bin,
                     coalesce(n_ref, 0) AS n_ref,
                     coalesce(n_new, 0) AS n_new
              FROM rb FULL OUTER JOIN nb ON rb.bin = nb.bin),
            tot AS (SELECT sum(n_ref)::DOUBLE AS tr,
                           sum(n_new)::DOUBLE AS tn FROM j)
            SELECT round(sum((greatest(n_ref / tr, 1e-6)
                              - greatest(n_new / tn, 1e-6))
                          * ln(greatest(n_ref / tr, 1e-6)
                               / greatest(n_new / tn, 1e-6))), 6) AS psi,
                   count(*)::BIGINT AS n_bins
            FROM j, tot
        """,
        "key_skew": """
            WITH c AS (
              SELECT user_id AS key, count(*)::BIGINT AS n
              FROM events GROUP BY user_id)
            SELECT sum(n)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_keys,
                   max(n) AS max_count,
                   round(avg(n), 6) AS avg_count,
                   round(max(n) / avg(n), 6) AS skew_factor,
                   coalesce(sum(CASE WHEN key IS NULL THEN n END),
                            0)::BIGINT AS null_rows,
                   round(max(n)::DOUBLE / sum(n), 6) AS top1_share
            FROM c
        """,
        "heavy_keys": """
            WITH c AS (
              SELECT user_id, count(*)::BIGINT AS n
              FROM events GROUP BY user_id),
            t AS (SELECT sum(n)::DOUBLE AS tot FROM c)
            SELECT user_id, n, round(n / tot, 6) AS share
            FROM c, t
            ORDER BY n DESC, user_id ASC NULLS FIRST
            LIMIT 10
        """,
        "anomaly_scan": """
            WITH man AS (
              SELECT event_type AS part, day(ts)::DOUBLE AS finished_at,
                     count(*)::DOUBLE AS n_rows,
                     sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::DOUBLE
                       AS n_bad_rows,
                     sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::DOUBLE
                       AS n_violations
              FROM events GROUP BY 1, 2),
            lng AS (
              SELECT part, finished_at, 'n_rows' AS metric, n_rows AS value
              FROM man
              UNION ALL
              SELECT part, finished_at, 'n_bad_rows', n_bad_rows FROM man
              UNION ALL
              SELECT part, finished_at, 'n_violations', n_violations FROM man),
            sc AS (
              SELECT part, finished_at, metric, value,
                     avg(value) OVER w AS mean,
                     stddev_samp(value) OVER w AS sd,
                     count(value) OVER w AS n_history
              FROM lng
              WINDOW w AS (PARTITION BY part, metric ORDER BY finished_at
                           ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)),
            scored AS (
              SELECT *, CASE WHEN sd > 0 THEN abs((value - mean) / sd)
                             WHEN value = mean THEN 0.0
                             ELSE 'infinity'::DOUBLE END AS raw_score
              FROM sc)
            SELECT part, finished_at, metric, value,
                   round(mean, 6) AS baseline, n_history,
                   round(raw_score, 6) AS score,
                   CASE WHEN n_history < 3 THEN NULL
                        ELSE raw_score > 2.0 END AS is_anomaly
            FROM scored ORDER BY part, finished_at, metric
        """,
        "suggest_schema": """
            WITH m AS (
              SELECT min(doc_id) AS doc_min, max(doc_id) AS doc_max,
                     min(length(text)) AS t_min, max(length(text)) AS t_max,
                     min(n_chars) AS nc_min, max(n_chars) AS nc_max,
                     min(length(source)) AS s_min, max(length(source)) AS s_max,
                     count(DISTINCT lang) AS lang_dv,
                     count(DISTINCT source) AS src_dv
              FROM documents),
            lv AS (SELECT string_agg('''' || lang || '''', ', '
                                     ORDER BY lang) AS ls
                   FROM (SELECT DISTINCT lang FROM documents
                         WHERE lang IS NOT NULL)),
            sv AS (SELECT string_agg('''' || source || '''', ', '
                                     ORDER BY source) AS ss,
                          min(length(source)) AS s_min,
                          max(length(source)) AS s_max
                   FROM (SELECT DISTINCT source FROM documents
                         WHERE source IS NOT NULL))
            SELECT * FROM (
              SELECT 'doc_id' AS "column",
                     'int.min(' || doc_min || ').max(' || doc_max || ')'
                     AS element FROM m
              UNION ALL SELECT 'lang',
                     CASE WHEN lang_dv <= 12
                          THEN '[''enum'', ' || lv.ls || ']'
                          ELSE 'str.minlen(?).maxlen(?)' END FROM m, lv
              UNION ALL SELECT 'n_chars',
                     'int.min(' || nc_min || ').max(' || nc_max || ')' FROM m
              UNION ALL SELECT 'source',
                     CASE WHEN src_dv <= 12
                          THEN '[''enum'', ' || sv.ss || ']'
                          ELSE 'str.minlen(' || m.s_min || ').maxlen('
                               || m.s_max || ')' END FROM m, sv
              UNION ALL SELECT 'text',
                     'str.minlen(' || t_min || ').maxlen(' || t_max || ')'
                     FROM m
            ) ORDER BY "column"
        """,
        "encoding_audit": f"""
            WITH e AS (
              SELECT source,
                text
                || CASE WHEN doc_id % 7 = 0
                     THEN ' lost ' || chr(65533) || ' byte' ELSE '' END
                || CASE WHEN doc_id % 11 = 0
                     THEN ' bell ' || chr(7) || ' char' ELSE '' END
                || CASE WHEN doc_id % 13 = 0
                     THEN ' moji Ã© and â€™ quote'
                     ELSE '' END
                || CASE WHEN doc_id % 17 = 0
                     THEN ' zw ' || chr(8203) || ' here' ELSE '' END AS text
              FROM documents),
            c AS (SELECT source, {enc_cnt} FROM e),
            t AS (SELECT *, {enc_tot} AS tot FROM c)
            SELECT source, count(*)::BIGINT AS n_docs, {enc_docs},
                   CAST(sum(tot) AS BIGINT) AS total_bad_chars,
                   round(avg(CASE WHEN tot = 0 THEN 1.0 ELSE 0.0 END), 6)
                     AS clean_frac
            FROM t GROUP BY source ORDER BY source
        """,
        "robust_outliers": """
            WITH med AS (
              SELECT event_type, quantile_cont(value, 0.5) AS m
              FROM events GROUP BY event_type),
            mad AS (
              SELECT e.event_type,
                     quantile_cont(abs(e.value - med.m), 0.5) AS mad
              FROM events e JOIN med ON e.event_type = med.event_type
              GROUP BY e.event_type),
            z AS (
              SELECT e.event_type, e.value,
                CASE WHEN mad.mad > 0 THEN
                  0.6744897501960817 * (e.value - med.m) / mad.mad
                END AS rz
              FROM events e
              JOIN med ON e.event_type = med.event_type
              JOIN mad ON e.event_type = mad.event_type)
            SELECT event_type, count(value)::BIGINT AS n,
                   CAST(sum(CASE WHEN abs(rz) > 3.5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_outliers,
                   round(max(abs(rz)), 6) AS max_abs_z
            FROM z GROUP BY event_type ORDER BY event_type
        """,
        "embedding_audit": """
            WITH e AS (
              SELECT vec_id,
                CASE
                  WHEN vec_id % 89 = 0
                    THEN list_concat(['nan'::FLOAT], embedding[2:64])
                  WHEN vec_id % 97 = 0
                    THEN list_concat(['inf'::FLOAT], embedding[2:64])
                  WHEN vec_id % 101 = 0
                    THEN list_concat([NULL::FLOAT], embedding[2:64])
                  WHEN vec_id % 103 = 0 THEN embedding[1:63]
                  WHEN vec_id % 107 = 0
                    THEN list_transform(generate_series(1, 64),
                                        x -> 0.0::FLOAT)
                  WHEN vec_id % 109 = 0 THEN NULL
                  ELSE embedding END AS emb
              FROM embeddings),
            f AS (
              SELECT
                (emb IS NULL) AS null_vec,
                (emb IS NOT NULL AND len(emb) != 64) AS wrong_dim,
                (emb IS NOT NULL
                 AND len(list_filter(emb, x -> x IS NULL)) > 0) AS null_elem,
                coalesce(list_contains(emb, 'nan'::FLOAT), FALSE) AS has_nan,
                coalesce(list_contains(emb, 'inf'::FLOAT)
                         OR list_contains(emb, '-inf'::FLOAT), FALSE)
                  AS has_inf,
                (emb IS NOT NULL AND len(emb) > 0
                 AND list_min(emb) = 0 AND list_max(emb) = 0) AS zero_vec
              FROM e)
            SELECT count(*)::BIGINT AS n_rows,
              CAST(sum(CASE WHEN null_vec THEN 1 ELSE 0 END) AS BIGINT)
                AS n_null_vec,
              CAST(sum(CASE WHEN wrong_dim THEN 1 ELSE 0 END) AS BIGINT)
                AS n_wrong_dim,
              CAST(sum(CASE WHEN null_elem THEN 1 ELSE 0 END) AS BIGINT)
                AS n_null_elem,
              CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT)
                AS n_nan,
              CAST(sum(CASE WHEN has_inf THEN 1 ELSE 0 END) AS BIGINT)
                AS n_inf,
              CAST(sum(CASE WHEN zero_vec THEN 1 ELSE 0 END) AS BIGINT)
                AS n_zero_vec,
              CAST(sum(CASE WHEN NOT (null_vec OR wrong_dim OR null_elem
                        OR has_nan OR has_inf OR zero_vec)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
            FROM f
        """,
        "fd_check": """
            WITH pre AS (
              SELECT DISTINCT doc_id % 100 AS k, lang AS v
              FROM documents WHERE lang IS NOT NULL),
            r AS (
              SELECT k, v,
                row_number() OVER (PARTITION BY k ORDER BY v) AS rk,
                count(*) OVER (PARTITION BY k) AS nv
              FROM pre)
            SELECT k, nv::BIGINT AS n_values,
                   string_agg(v, '|' ORDER BY v) AS "values"
            FROM r WHERE nv > 1 AND rk <= 3
            GROUP BY k, nv ORDER BY k
        """,
        "ordering_check": """
            WITH e AS (
              SELECT user_id, event_id,
                ts - CASE WHEN event_id % 31 = 0 THEN INTERVAL 6 HOUR
                          ELSE INTERVAL 0 HOUR END AS ts
              FROM events),
            r AS (
              SELECT user_id, event_id, ts,
                lag(ts) OVER (PARTITION BY user_id
                              ORDER BY event_id) AS prev_ts
              FROM e)
            SELECT user_id, event_id, ts, prev_ts
            FROM r WHERE ts < prev_ts
            ORDER BY user_id, event_id LIMIT 500
        """,
        "json_props_validate": """
            WITH p AS (
              SELECT event_id,
                     json_extract_string(props, '$.k') AS ks,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events),
            v AS (
              SELECT event_id, 'k.min' AS rule_id,
                     chr(39) || ks || chr(39) AS value FROM p WHERE k < 10
              UNION ALL
              SELECT event_id, 'k.max',
                     chr(39) || ks || chr(39) FROM p WHERE k > 80)
            SELECT event_id, rule_id, value FROM v
            ORDER BY event_id, rule_id
        """,
        "jsd_drift": """
            WITH a AS (SELECT event_type AS cat, count(*) AS na
                       FROM events WHERE event_id % 2 = 0 GROUP BY 1),
            b AS (SELECT event_type AS cat, count(*) AS nb
                  FROM events WHERE event_id % 2 = 1 GROUP BY 1),
            j AS (SELECT coalesce(a.na, 0) AS na, coalesce(b.nb, 0) AS nb
                  FROM a FULL OUTER JOIN b ON a.cat = b.cat),
            t AS (SELECT sum(na) AS ta, sum(nb) AS tb,
                         count(*) AS nc FROM j),
            w AS (SELECT na / ta::DOUBLE AS p, nb / tb::DOUBLE AS q,
                         nc, ta, tb FROM j, t)
            SELECT round(sum(
                     (CASE WHEN p > 0 THEN p * log2(p / ((p + q) / 2))
                           ELSE 0 END
                      + CASE WHEN q > 0 THEN q * log2(q / ((p + q) / 2))
                             ELSE 0 END) / 2), 6) AS jsd,
                   nc::BIGINT AS n_categories,
                   ta::BIGINT AS n_ref, tb::BIGINT AS n_new
            FROM w GROUP BY nc, ta, tb
        """,
        # round-3 upgrades: formerly rows-only, now hash-oracled
        "image_audit": r"""
            WITH ids AS (
              SELECT i FROM generate_series(0, 299) s(i) WHERE i % 3 = 0),
            hx AS (
              -- rebuild the exact fake-media PNG header bytes
              -- (make_fake_media, multimodal.py) and re-render as hex
              SELECT i, hex(unhex(
                     '89504E470D0A1A0A' || '0000000D' || '49484452'
                     || lpad(hex(16 + (i % 64) * 16), 8, '0')
                     || lpad(hex(16 + (i % 48) * 16), 8, '0')
                     || '0806000000')) AS h
              FROM ids),
            cor AS (
              -- the query decapitates every 10th image row (16 bytes)
              SELECT i, CASE WHEN i % 10 = 0 THEN substr(h, 33)
                             ELSE h END AS h
              FROM hx),
            parsed AS (
              -- independent fixed-offset header parse on the hex form
              SELECT CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A'
                          THEN 'png' ELSE 'bad_header' END AS format,
                     CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A'
                          THEN ('0x' || substr(h, 33, 8))::BIGINT
                          END AS width,
                     CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A'
                          THEN ('0x' || substr(h, 41, 8))::BIGINT
                          END AS height
              FROM cor)
            SELECT format, count(*) AS n,
                   min(width) AS min_width, max(width) AS max_width,
                   min(height) AS min_height, max(height) AS max_height
            FROM parsed GROUP BY format ORDER BY format
        """,
        "kmeans_clusters": r"""
            WITH x AS (
              SELECT vec_id,
                     list_transform(embedding, t -> t::DOUBLE /
                       coalesce(nullif(sqrt(list_sum(list_transform(
                         embedding, u -> u::DOUBLE * u::DOUBLE))), 0), 1))
                       AS v
              FROM embeddings),
            c0 AS (SELECT vec_id AS cid, v FROM x WHERE vec_id < 8),
            d1 AS (
              SELECT x.vec_id, c.cid, sum(x.v[s.i] * c.v[s.i]) AS dot
              FROM x, c0 c, generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            a1 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, cid) AS rk
                FROM d1) WHERE rk = 1),
            m1 AS (
              SELECT a.cid, s.i, sum(x.v[s.i]) / count(*) AS mv
              FROM a1 a JOIN x USING (vec_id), generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            c1 AS (SELECT cid, list(mv ORDER BY i) AS m FROM m1
                   GROUP BY cid),
            c1n AS (
              SELECT cid, list_transform(m, t -> t /
                       coalesce(nullif(sqrt(list_sum(list_transform(
                         m, u -> u * u))), 0), 1)) AS v
              FROM c1),
            d2 AS (
              SELECT x.vec_id, c.cid, sum(x.v[s.i] * c.v[s.i]) AS dot
              FROM x, c1n c, generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            a2 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, cid) AS rk
                FROM d2) WHERE rk = 1),
            m2 AS (
              SELECT a.cid, s.i, sum(x.v[s.i]) / count(*) AS mv
              FROM a2 a JOIN x USING (vec_id), generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            c2 AS (SELECT cid, list(mv ORDER BY i) AS m FROM m2
                   GROUP BY cid),
            c2n AS (
              SELECT cid, list_transform(m, t -> t /
                       coalesce(nullif(sqrt(list_sum(list_transform(
                         m, u -> u * u))), 0), 1)) AS v
              FROM c2),
            d3 AS (
              SELECT x.vec_id, c.cid, sum(x.v[s.i] * c.v[s.i]) AS dot
              FROM x, c2n c, generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            a3 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, cid) AS rk
                FROM d3) WHERE rk = 1)
            SELECT cid AS cluster, count(*) AS n
            FROM a3 GROUP BY cid ORDER BY cluster
        """,
        # Multi-shard FFD packing replay: same greedy walk as pack_oracle
        # but with 8 independent walks advanced in lockstep by one
        # RECURSIVE CTE partitioned on the (doc_id % 8) shard — the
        # shard_col override makes the Spark side's sharding
        # SQL-recomputable (the default xxhash64 shard is not).
        "pack_stats": """
            WITH RECURSIVE base AS (
              SELECT CAST(doc_id AS VARCHAR) AS id,
                     CAST(n_chars AS BIGINT) AS n,
                     CAST(((coalesce(doc_id, 0) % 8) + 8) % 8 AS INT) AS shard,
                     row_number() OVER (
                       PARTITION BY CAST(((coalesce(doc_id, 0) % 8) + 8) % 8 AS INT)
                       ORDER BY n_chars DESC NULLS LAST,
                                CAST(doc_id AS VARCHAR) ASC) AS rn
              FROM documents),
            walk AS (
              SELECT shard, CAST(0 AS BIGINT) AS rn,
                     CAST(-1 AS BIGINT) AS cur,
                     CAST(0 AS BIGINT) AS fill, CAST(0 AS BIGINT) AS nxt,
                     CAST(NULL AS VARCHAR) AS bin_id,
                     CAST(NULL AS BOOLEAN) AS trunc,
                     CAST(NULL AS BIGINT) AS n
              FROM (SELECT DISTINCT shard FROM base)
              UNION ALL
              SELECT b.shard, b.rn,
                CASE WHEN coalesce(b.n, 0) > 1024 THEN w.cur
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN w.nxt
                     ELSE w.cur END,
                CASE WHEN coalesce(b.n, 0) > 1024 THEN w.fill
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN coalesce(b.n, 0)
                     ELSE w.fill + coalesce(b.n, 0) END,
                CASE WHEN coalesce(b.n, 0) > 1024 THEN w.nxt + 1
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN w.nxt + 1
                     ELSE w.nxt END,
                CASE WHEN coalesce(b.n, 0) > 1024
                       THEN CAST(b.shard AS VARCHAR) || '/'
                            || CAST(w.nxt AS VARCHAR)
                     WHEN w.cur < 0 OR w.fill + coalesce(b.n, 0) > 1024
                       THEN CAST(b.shard AS VARCHAR) || '/'
                            || CAST(w.nxt AS VARCHAR)
                     ELSE CAST(b.shard AS VARCHAR) || '/'
                          || CAST(w.cur AS VARCHAR) END,
                coalesce(b.n, 0) > 1024,
                coalesce(b.n, 0)
              FROM walk w JOIN base b
                ON b.shard = w.shard AND b.rn = w.rn + 1),
            per AS (
              SELECT bin_id, count(*) AS n_docs, sum(n) AS tok,
                     max(CASE WHEN trunc THEN 1 ELSE 0 END) AS tr
              FROM walk WHERE rn > 0 GROUP BY bin_id)
            SELECT count(*)::BIGINT AS n_bins,
                   CAST(sum(n_docs) AS BIGINT) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS total_tokens,
                   coalesce(round(
                     sum(CASE WHEN tr = 0 THEN tok END)::DOUBLE
                     / (sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) * 1024),
                     6), 0.0) AS utilization,
                   CAST(sum(tr) AS BIGINT) AS n_truncated
            FROM per
        """,
        # IVF probe replay: pinned first-32-by-vec_id coarse quantizer,
        # probe selection by centroid·query (ties -> lowest centroid
        # rank, matching np.argsort stability), per-row argmax cell
        # (np.argmax tie -> first), exact cosine inside the probed cells
        # with the ann_topk round-6 projection.  Row normalization is
        # skipped in the assignment ranking: argmax over dot(x, c) is
        # invariant to scaling x by its positive norm.
        "ivf_topk": """
            WITH q AS (
              SELECT list_transform(embedding, t -> t::DOUBLE) AS qe
              FROM embeddings WHERE vec_id = 0),
            cents AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                     list_transform(embedding, t -> t::DOUBLE) AS e
              FROM embeddings WHERE vec_id <> 0
              ORDER BY vec_id LIMIT 32),
            cn AS (
              SELECT cid, list_transform(e, t -> t /
                       coalesce(nullif(sqrt(list_inner_product(e, e)), 0),
                                1)) AS cv
              FROM cents),
            probes AS (
              SELECT cid FROM (
                SELECT c.cid,
                       row_number() OVER (
                         ORDER BY list_inner_product(c.cv,
                           list_transform(q.qe, t -> t /
                             coalesce(nullif(sqrt(list_inner_product(
                               q.qe, q.qe)), 0), 1))) DESC,
                         c.cid) AS rk
                FROM cn c, q) WHERE rk <= 16),
            x AS (
              SELECT vec_id,
                     list_transform(embedding, t -> t::DOUBLE) AS e
              FROM embeddings WHERE vec_id <> 0),
            assign AS (
              SELECT vec_id, cid FROM (
                SELECT x.vec_id, c.cid,
                       row_number() OVER (
                         PARTITION BY x.vec_id
                         ORDER BY list_inner_product(x.e, c.cv) DESC,
                                  c.cid) AS rk
                FROM x, cn c) WHERE rk = 1),
            s AS (
              SELECT x.vec_id,
                     list_sum(list_transform(range(1, 65),
                         i -> x.e[i] * q.qe[i])) /
                     (sqrt(list_sum(list_transform(range(1, 65),
                         i -> x.e[i] * x.e[i])))
                      * sqrt(list_sum(list_transform(range(1, 65),
                         i -> q.qe[i] * q.qe[i])))) AS cos
              FROM x JOIN assign a USING (vec_id), q
              WHERE a.cid IN (SELECT cid FROM probes))
            SELECT vec_id, round(cos, 6) AS cosine
            FROM s ORDER BY cos DESC, vec_id LIMIT 10
        """,
        # Full SemDeDup replay: 2 Lloyd iterations seeded with the first
        # 8 embeddings by vec_id over the duplicate-injected union (same
        # unrolled update as the kmeans_clusters twin), final cell
        # assignment, then the within-cell pair scan at cosine >= 0.999
        # on the RAW (un-normalized) vectors, round-9 like the operator.
        "semantic_dups": """
            WITH u AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000, embedding FROM embeddings
              WHERE vec_id % 50 = 0),
            x AS (
              SELECT vec_id,
                     list_transform(embedding, t -> t::DOUBLE /
                       coalesce(nullif(sqrt(list_sum(list_transform(
                         embedding, w -> w::DOUBLE * w::DOUBLE))), 0), 1))
                       AS v
              FROM u),
            c0 AS (SELECT vec_id AS cid, v FROM x WHERE vec_id < 8),
            d1 AS (
              SELECT x.vec_id, c.cid, sum(x.v[s.i] * c.v[s.i]) AS dot
              FROM x, c0 c, generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            a1 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, cid) AS rk
                FROM d1) WHERE rk = 1),
            m1 AS (
              SELECT a.cid, s.i, sum(x.v[s.i]) / count(*) AS mv
              FROM a1 a JOIN x USING (vec_id), generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            c1 AS (SELECT cid, list(mv ORDER BY i) AS m FROM m1
                   GROUP BY cid),
            c1n AS (
              SELECT cid, list_transform(m, t -> t /
                       coalesce(nullif(sqrt(list_sum(list_transform(
                         m, w -> w * w))), 0), 1)) AS v
              FROM c1),
            d2 AS (
              SELECT x.vec_id, c.cid, sum(x.v[s.i] * c.v[s.i]) AS dot
              FROM x, c1n c, generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            a2 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, cid) AS rk
                FROM d2) WHERE rk = 1),
            m2 AS (
              SELECT a.cid, s.i, sum(x.v[s.i]) / count(*) AS mv
              FROM a2 a JOIN x USING (vec_id), generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            c2 AS (SELECT cid, list(mv ORDER BY i) AS m FROM m2
                   GROUP BY cid),
            c2n AS (
              SELECT cid, list_transform(m, t -> t /
                       coalesce(nullif(sqrt(list_sum(list_transform(
                         m, w -> w * w))), 0), 1)) AS v
              FROM c2),
            d3 AS (
              SELECT x.vec_id, c.cid, sum(x.v[s.i] * c.v[s.i]) AS dot
              FROM x, c2n c, generate_series(1, 64) s(i)
              GROUP BY 1, 2),
            a3 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, cid) AS rk
                FROM d3) WHERE rk = 1),
            raw AS (
              SELECT vec_id,
                     list_transform(embedding, t -> t::DOUBLE) AS e
              FROM u),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_inner_product(ra.e, rb.e) /
                       (sqrt(list_inner_product(ra.e, ra.e))
                        * sqrt(list_inner_product(rb.e, rb.e))), 9)
                       AS cosine
              FROM a3 a JOIN a3 b
                ON a.cid = b.cid AND a.vec_id < b.vec_id
              JOIN raw ra ON ra.vec_id = a.vec_id
              JOIN raw rb ON rb.vec_id = b.vec_id)
            SELECT id_a, id_b, cosine FROM pairs
            WHERE cosine IS NOT NULL AND NOT isnan(cosine)
              AND cosine >= 0.999
            ORDER BY id_a, id_b
        """,
        # Generic replay of the loss-span prefix-sum algebra: rebuild the
        # dialog_check/dialog_render turn lists, unnest with position,
        # window-sum previous line lengths (+2-char ': ' role_sep and
        # 2-char turn_sep), content span = [line_start + role + sep,
        # +content).  Empty dialogs (doc_id % 23 = 0) contribute no rows.
        "loss_mask": r"""
            WITH t AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                CASE
                  WHEN doc_id % 23 = 0
                    THEN CAST([] AS STRUCT(role VARCHAR,
                                           content VARCHAR)[])
                  WHEN doc_id % 19 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'system', 'content': 'late'},
                    {'role': 'user', 'content': 'u-' || doc_id},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                  WHEN doc_id % 17 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'tool', 'content': 'beep'},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                  WHEN doc_id % 13 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'user', 'content': ''},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                  WHEN doc_id % 11 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'user', 'content': 'u-' || doc_id},
                    {'role': 'assistant', 'content': 'a-' || doc_id},
                    {'role': 'user', 'content': 'bye'}]
                  ELSE [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'user', 'content': 'u-' || doc_id},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                END AS turns
              FROM documents WHERE doc_id IS NOT NULL),
            ex AS (
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(turns)),
                       i -> {'idx': i - 1,
                             'role': coalesce(turns[i].role, ''),
                             'content': coalesce(turns[i].content, '')}))
                       AS g
              FROM t),
            spans AS (
              SELECT doc_id,
                     CAST(g.idx AS INT) AS turn_idx,
                     g.role AS role,
                     coalesce(sum(length(g.role) + 2 + length(g.content)
                                  + 2) OVER (
                       PARTITION BY doc_id ORDER BY g.idx
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0)
                       + length(g.role) + 2 AS s,
                     length(g.content) AS clen
              FROM ex)
            SELECT doc_id, turn_idx, role,
                   s::BIGINT AS start_char,
                   (s + clen)::BIGINT AS end_char,
                   role = 'assistant' AS learn
            FROM spans ORDER BY doc_id, turn_idx
        """,
        # Histogram-bucket replay: length histogram, cumulative count
        # before each length, bucket = floor(rows_before * k / N), then
        # the per-bucket padding algebra.
        "length_buckets": """
            WITH h AS (
              SELECT n_chars AS len, count(*) AS n
              FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
            a AS (
              SELECT len, n,
                     CAST(floor(coalesce(sum(n) OVER (
                         ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) * 8
                       / (SELECT sum(n)::DOUBLE FROM h)) AS INT)
                       AS bucket
              FROM h),
            per AS (
              SELECT bucket, sum(n) AS n_seqs,
                     min(len) AS min_len, max(len) AS max_len,
                     sum(len * n) AS total_tokens
              FROM a GROUP BY bucket)
            SELECT bucket,
                   n_seqs::BIGINT AS n_seqs,
                   min_len::BIGINT AS min_len,
                   max_len::BIGINT AS max_len,
                   total_tokens::BIGINT AS total_tokens,
                   (n_seqs * max_len)::BIGINT AS padded_tokens,
                   CAST(floor((n_seqs * max_len - total_tokens)::DOUBLE
                        * 1000000 / (n_seqs * max_len)::DOUBLE) AS BIGINT)
                     AS waste_ppm
            FROM per ORDER BY bucket
        """,
        # Generic replay of the per-(source, role) turn scorecard over
        # the rebuilt dialog_check turn lists: unnest + group-by with
        # the same NULL-role label and empty-content accounting.
        "turn_stats": r"""
            WITH t AS (
              SELECT source,
                CASE
                  WHEN doc_id % 23 = 0
                    THEN CAST([] AS STRUCT(role VARCHAR,
                                           content VARCHAR)[])
                  WHEN doc_id % 19 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'system', 'content': 'late'},
                    {'role': 'user', 'content': 'u-' || doc_id},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                  WHEN doc_id % 17 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'tool', 'content': 'beep'},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                  WHEN doc_id % 13 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'user', 'content': ''},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                  WHEN doc_id % 11 = 0 THEN [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'user', 'content': 'u-' || doc_id},
                    {'role': 'assistant', 'content': 'a-' || doc_id},
                    {'role': 'user', 'content': 'bye'}]
                  ELSE [
                    {'role': 'system', 'content': 'sys-' || doc_id},
                    {'role': 'user', 'content': 'u-' || doc_id},
                    {'role': 'assistant', 'content': 'a-' || doc_id}]
                END AS turns
              FROM documents WHERE doc_id IS NOT NULL),
            ex AS (
              SELECT source, unnest(turns) AS g FROM t),
            rows_ AS (
              SELECT source,
                     coalesce(g.role, '<null>') AS role,
                     coalesce(length(g.content), 0) AS clen,
                     CASE WHEN g.content IS NULL OR g.content = ''
                          THEN 1 ELSE 0 END AS empty
              FROM ex)
            SELECT source, role,
                   count(*)::BIGINT AS n_turns,
                   round(avg(clen), 2) AS avg_content_chars,
                   max(clen)::BIGINT AS max_content_chars,
                   sum(empty)::BIGINT AS n_empty
            FROM rows_ GROUP BY source, role
            ORDER BY source, role
        """,
        # One-pass conditional sums per cutoff, cross-joined from VALUES;
        # ppm via the same floor(double-division) as the operator.
        "context_overflow": """
            WITH c(cutoff) AS (VALUES (64), (128), (256), (512)),
            b AS (
              SELECT source, n_chars::BIGINT AS ln
              FROM documents WHERE n_chars IS NOT NULL)
            SELECT b.source, c.cutoff,
                   count(*)::BIGINT AS n_seqs,
                   sum(CASE WHEN ln > cutoff THEN 1 ELSE 0 END)::BIGINT
                     AS n_over,
                   CAST(floor(sum(CASE WHEN ln > cutoff THEN 1 ELSE 0
                                  END)::DOUBLE * 1000000
                        / count(*)::DOUBLE) AS BIGINT) AS over_ppm,
                   sum(ln)::BIGINT AS tokens_total,
                   sum(greatest(ln - cutoff, 0))::BIGINT AS tokens_lost,
                   CAST(floor(sum(greatest(ln - cutoff, 0))::DOUBLE
                        * 1000000 / sum(ln)::DOUBLE) AS BIGINT)
                     AS lost_ppm
            FROM b, c GROUP BY b.source, c.cutoff
            ORDER BY b.source, c.cutoff
        """,
        # Same normalization (lower, digit runs -> '#', whitespace
        # collapse, trim) and md5-keyed grouping as the operator.
        "template_mining": r"""
            WITH src AS (
              SELECT CASE
                WHEN doc_id % 3 = 0 THEN
                  'Error 404: page ' || doc_id || ' not found'
                WHEN doc_id % 3 = 1 THEN
                  'Item ' || (doc_id % 50) || ' - price $'
                  || coalesce(n_chars, 0)
                ELSE text END AS text
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
            norm AS (
              SELECT trim(regexp_replace(regexp_replace(lower(text),
                       '[0-9]+', '#', 'g'), '\s+', ' ', 'g')) AS tpl,
                     text
              FROM src),
            grp AS (
              SELECT min(tpl) AS template, count(*) AS n_docs,
                     min(text) AS example
              FROM norm GROUP BY md5(tpl))
            SELECT template, n_docs, example
            FROM grp WHERE n_docs >= 2
            ORDER BY n_docs DESC, template LIMIT 50
        """,
    }
