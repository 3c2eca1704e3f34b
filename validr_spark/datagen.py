"""Deterministic synthetic tokenized-sequence table (FIXTURES.md §A).

Schema (BASELINE.json input_hint):
    doc_id : string       '{source}-{000000000}'
    tokens : array<int>   token ids in [0, vocab); len in [1, maxlen]
    n_tok  : int          invariant n_tok == size(tokens)
    source : string       skewed over {web, books, code, wiki, forums}

Violations are injected into 1% of rows, deterministically:
``crc32(doc_id) % 100 == 0`` selects a row, ``crc32(doc_id) // 100 % 6``
picks the kind (out-of-range token / n_tok mismatch / duplicate doc_id /
unknown source / empty tokens / null doc_id).

Everything is generated *distributed* from ``spark.range`` + hash
expressions — no driver-side data, no collect; the same (n_rows, vocab,
maxlen, seed) always produces byte-identical rows at any parallelism, so
correctness fixtures and the two-parallelism scaling bench read the same
input.  Generating 10^12 rows is a matter of raising n_rows; nothing here
is O(rows) on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = ["web", "books", "code", "wiki", "forums"]
# zipf-ish skew over 100 buckets: web is ~half of all rows (skew handling
# in uniqueness/histogram aggs is exercised on purpose)
_SOURCE_CUTS = [("web", 50), ("books", 70), ("code", 85), ("wiki", 95),
                ("forums", 100)]

VOCAB = 50257
MAXLEN_TEST = 512


def _pick_source(bucket):
    expr = F.lit(SOURCES[-1])
    for name, cut in reversed(_SOURCE_CUTS[:-1]):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return expr


def make_sequences(spark: SparkSession, n_rows: int, *, vocab: int = VOCAB,
                   maxlen: int = MAXLEN_TEST, seed: int = 42,
                   inject: bool = True, partitions: int | None = None) -> DataFrame:
    """Build the sequences table; ``inject=False`` gives an all-clean table."""
    df = spark.range(0, n_rows, 1, partitions) if partitions else \
        spark.range(n_rows)
    i = F.col("id")

    def h(*cols):
        # widen to long BEFORE abs: abs(int32) throws ARITHMETIC_OVERFLOW
        # under ANSI when the hash lands exactly on Integer.MIN_VALUE —
        # a ~1/2^32-per-call event that is near-certain over the ~10^10
        # hash calls of a large table build.  Numerically identical for
        # every other value, so generated data is unchanged.
        return F.abs(F.hash(F.lit(seed), i,
                            *[F.lit(c) for c in cols]).cast("long"))

    bucket = h("src") % 100
    source = _pick_source(bucket)
    # cast back to int: a LONG length would make F.sequence produce
    # array<long>, and the token lambda's hash(seed, i, k) hashes a long
    # k differently than an int k — changing every generated token
    length = ((h("len") % maxlen) + 1).cast("int")
    doc_id = F.format_string("%s-%09d", source, i)
    tokens = F.transform(
        F.sequence(F.lit(1), length),
        lambda k: (F.abs(F.hash(F.lit(seed), i, k).cast("long"))
                   % vocab).cast("int"))

    df = df.select(
        i.alias("_rid"),
        doc_id.alias("_doc_id"),
        tokens.alias("_tokens"),
        source.alias("_source"),
    )
    if not inject:
        return df.select(
            F.col("_doc_id").alias("doc_id"),
            F.col("_tokens").alias("tokens"),
            F.size("_tokens").cast("int").alias("n_tok"),
            F.col("_source").alias("source"),
        )

    sel = F.crc32(F.col("_doc_id"))
    is_bad = sel % 100 == 0
    kind = F.floor(sel / 100) % 6

    # kind 2: duplicate — copy the canonical doc_id of row (rid+1) % n_rows,
    # recomputed from the generator formula (no shuffle, no self-join).
    j = (F.col("_rid") + 1) % n_rows

    def hj(*cols):
        return F.abs(F.hash(F.lit(seed), j,
                            *[F.lit(c) for c in cols]).cast("long"))

    dup_doc_id = F.format_string("%s-%09d", _pick_source(hj("src") % 100), j)

    tokens = F.col("_tokens")
    bad_tokens = (
        F.when(kind == 0,
               F.concat(F.array(F.lit(-1).cast("int")),
                        F.slice(tokens, 2, F.size(tokens))))
        .when(kind == 4, F.array().cast("array<int>"))
        .otherwise(tokens))
    n_tok = (F.when(kind == 1, F.size(tokens) + 7)
             .otherwise(F.size(bad_tokens))).cast("int")
    doc_id = (F.when(kind == 2, dup_doc_id)
              .when(kind == 5, F.lit(None).cast("string"))
              .otherwise(F.col("_doc_id")))
    source = (F.when(kind == 3, F.lit("unknown"))
              .otherwise(F.col("_source")))

    return df.select(
        F.when(is_bad, doc_id).otherwise(F.col("_doc_id")).alias("doc_id"),
        F.when(is_bad, bad_tokens).otherwise(tokens).alias("tokens"),
        F.when(is_bad, n_tok).otherwise(F.size(tokens).cast("int")).alias("n_tok"),
        F.when(is_bad, source).otherwise(F.col("_source")).alias("source"),
    )


def make_sources_dim(spark: SparkSession) -> DataFrame:
    """Referential dimension; 'forums' is intentionally absent so the
    referential anti-join is non-empty (FIXTURES.md §A)."""
    rows = [(s, 1.0 / (k + 1)) for k, s in enumerate(SOURCES) if s != "forums"]
    return spark.createDataFrame(rows, "source string, weight double")


def sequences_schema():
    """The validation schema under test (FIXTURES.md §A)."""
    from .schema import T

    return T.dict(
        doc_id=T.str.minlen(1).maxlen(64),
        tokens=T.list(T.int.min(0).max(VOCAB - 1)).minlen(1).maxlen(8192),
        n_tok=T.int.min(1).max(8192),
        source=T.enum(" ".join(SOURCES)),
    )
