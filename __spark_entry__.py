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


# --- rows-only queries (non-SQL-expressible; weaker driver check) ----------

def q_minhash_pairs(spark, sf):
    df = _load(spark, sf, "documents")
    return (dedup.minhash_candidates(df, num_hashes=32, bands=8)
            .filter(F.col("n_bands_matched") >= 2)
            .orderBy("id_a", "id_b"))


def q_simhash_pairs(spark, sf):
    df = _load(spark, sf, "documents")
    return dedup.simhash_near_dups(df, max_hamming=8).orderBy("id_a", "id_b")


def q_lsh_topk(spark, sf):
    emb = _load(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return similarity.lsh_topk(emb.filter(F.col("vec_id") != 0),
                               [float(x) for x in query], k=10, nbits=6)


def q_ivf_topk(spark, sf):
    emb = _load(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return similarity.ivf_topk(emb.filter(F.col("vec_id") != 0),
                               [float(x) for x in query], k=10,
                               n_centroids=32, nprobe=16)


def q_text_profile(spark, sf):
    df = _load(spark, sf, "documents")
    prof = textstats.text_profile(df)
    return (prof.groupBy("lang_detected")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("quality"), 4).alias("avg_quality"))
            .orderBy("lang_detected"))


def q_sequences_validate(spark, sf):
    """Flagship north-star pipeline on the generated sequences table."""
    from validr_spark.datagen import make_sequences, sequences_schema

    seq = make_sequences(spark, 20_000, maxlen=128)
    plan = SparkCompiler().compile(sequences_schema())
    res = plan.apply(seq, id_cols=["doc_id"])
    return res.summary()


def q_manifest_run(spark, sf):
    """Resumable manifest-checkpointed run (plans/manifest.py) over the
    generated sequences table; returns the per-partition verdict rows."""
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
    df = _load(spark, sf, "documents")
    return (dedup.ngram_jaccard_pairs(df, ngram=3, threshold=0.4)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
            .orderBy("id_a", "id_b"))


def q_multimodal_features(spark, sf):
    from validr_spark.operators.multimodal import (extract_features,
                                                   make_fake_media)

    media = make_fake_media(spark, 200)
    feats = extract_features(media, decoder="fake")
    return (feats.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("n_bytes"), 2).alias("avg_bytes"))
            .orderBy("kind"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
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
        "token_counts": q_token_counts,
        "lang_hist": q_lang_hist,
        "ann_topk": q_ann_topk,
        "embedding_stats": q_embedding_stats,
        "events_validate": q_events_validate,
        "doc_profile": q_doc_profile,
        "chars_quantiles": q_chars_quantiles,
        "orphan_rows": q_orphan_rows,
        "dup_keys_salted": q_dup_keys_salted,
        # rows-only (no SQL oracle)
        "manifest_run": q_manifest_run,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "text_profile": q_text_profile,
        "sequences_validate": q_sequences_validate,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    # single quotes inside SQL string literals must be doubled
    lang_expects = _enum_expects(DOC_LANGS).replace("'", "''")
    src_expects = _enum_expects(DOC_SOURCES).replace("'", "''")
    doc_src_list = ", ".join(repr(s) for s in DOC_SOURCES)
    clip = ("CASE WHEN length({c}) > 75 THEN '''' || substr({c}, 1, 75) "
            "|| '..''' ELSE '''' || {c} || '''' END")
    return {
        "doc_null_rate": """
            SELECT count(*)::BIGINT AS n_rows,
                   CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   round(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS null_rate
            FROM documents
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
            WITH v AS (
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
            )
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
            ORDER BY id, rule_id
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
    }
