"""Constraint suggestion — profile a DataFrame and draft a validr schema.

``suggest_schema(df)`` runs ONE aggregation pass (algebraic aggregates +
HLL sketches, map-side partials — scan-bound at 10^12 rows) and lowers
the observed envelope to a validr Schema:

* numeric → ``int/float.min(observed).max(observed)``
* string → ``str.minlen/maxlen`` over char length; if the HLL distinct
  estimate is tiny, a second bounded pass collects the value set and
  emits ``enum(...)`` instead
* bool/date/timestamp/binary → the matching scalar validator
* array<T> → ``list(inner).minlen/maxlen`` over element counts, with
  numeric element ranges from one ``array_min/array_max`` screen
* any column with observed nulls (or '' for strings) → ``.optional``

The output is a *draft* — observed bounds are the tightest schema the
sample satisfies, which a human widens (e.g. min(3) → min(0)) before
gating production data.  ``suggest_schema(...).to_primitive()`` round-
trips through ``Schema.parse_isomorph_schema`` so drafts can be stored
as JSON next to the manifest.

The reference has no suggestion layer; the draft targets its schema
grammar exactly (element strings per
/root/reference/src/validr/schema.py:56-81) so a draft compiles under
either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as st

from validr_spark.schema import Schema

__all__ = ["suggest_schema", "suggest_elements", "value_variants"]

_SUGGESTABLE_ENUM = (st.StringType, st.LongType, st.IntegerType,
                     st.ShortType, st.ByteType)


def _agg_exprs(name: str, dtype: st.DataType):
    c = F.col(name)
    exprs = [F.sum(c.isNull().cast("long")).alias(f"{name}__nulls"),
             F.count(F.lit(1)).alias(f"{name}__n")]
    if isinstance(dtype, st.StringType):
        exprs += [F.min(F.char_length(c)).alias(f"{name}__minlen"),
                  F.max(F.char_length(c)).alias(f"{name}__maxlen"),
                  F.sum((c == "").cast("long")).alias(f"{name}__empty"),
                  F.expr(f"approx_count_distinct({name})")
                  .alias(f"{name}__dv")]
    elif isinstance(dtype, (st.IntegerType, st.LongType, st.ShortType,
                            st.ByteType)):
        exprs += [F.min(c).cast("long").alias(f"{name}__min"),
                  F.max(c).cast("long").alias(f"{name}__max"),
                  F.expr(f"approx_count_distinct({name})")
                  .alias(f"{name}__dv")]
    elif isinstance(dtype, (st.DoubleType, st.FloatType, st.DecimalType)):
        exprs += [F.min(c).cast("double").alias(f"{name}__min"),
                  F.max(c).cast("double").alias(f"{name}__max")]
    elif isinstance(dtype, st.BinaryType):
        exprs += [F.min(F.octet_length(c)).alias(f"{name}__minlen"),
                  F.max(F.octet_length(c)).alias(f"{name}__maxlen")]
    elif isinstance(dtype, st.ArrayType):
        exprs += [F.min(F.size(c)).alias(f"{name}__minlen"),
                  F.max(F.size(c)).alias(f"{name}__maxlen")]
        if isinstance(dtype.elementType, (st.IntegerType, st.LongType,
                                          st.ShortType, st.ByteType)):
            exprs += [F.min(F.array_min(c)).cast("long")
                      .alias(f"{name}__emin"),
                      F.max(F.array_max(c)).cast("long")
                      .alias(f"{name}__emax")]
        elif isinstance(dtype.elementType, (st.DoubleType, st.FloatType)):
            exprs += [F.min(F.array_min(c)).cast("double")
                      .alias(f"{name}__emin"),
                      F.max(F.array_max(c)).cast("double")
                      .alias(f"{name}__emax")]
    return exprs


def _fmt(v):
    # full-precision repr: rounding a bound would clip the observed
    # envelope (e.g. max 14.142857142857142 -> 14.142857 rejects the max
    # row itself).  Python float repr round-trips exactly.
    if isinstance(v, float):
        return repr(v)
    return repr(int(v))


def _scalar_element(name: str, dtype: st.DataType, m: dict,
                    enum_values: dict):
    if name in enum_values:
        # enum's isomorph form is the list ['enum', v1, v2, ...]
        return ["enum", *enum_values[name]]
    # all-NULL column: min/max/len aggregates are NULL — nothing to
    # profile, so draft the permissive element instead of rendering
    # 'str.minlen(None)' or crashing _fmt(int(None)).  The caller
    # appends '.optional' (null count > 0 by construction).
    if isinstance(dtype, st.StringType):
        if m.get(f"{name}__minlen") is None:
            return "any"
        return (f"str.minlen({m[f'{name}__minlen']})"
                f".maxlen({m[f'{name}__maxlen']})")
    if isinstance(dtype, (st.IntegerType, st.LongType, st.ShortType,
                          st.ByteType)):
        if m.get(f"{name}__min") is None:
            return "any"
        return (f"int.min({_fmt(m[f'{name}__min'])})"
                f".max({_fmt(m[f'{name}__max'])})")
    if isinstance(dtype, (st.DoubleType, st.FloatType, st.DecimalType)):
        if m.get(f"{name}__min") is None:
            return "any"
        return (f"float.min({_fmt(m[f'{name}__min'])})"
                f".max({_fmt(m[f'{name}__max'])})")
    if isinstance(dtype, st.BooleanType):
        return "bool"
    if isinstance(dtype, st.DateType):
        return "date"
    if isinstance(dtype, st.TimestampType):
        return "datetime"
    if isinstance(dtype, st.BinaryType):
        if m.get(f"{name}__minlen") is None:
            return "any"
        return (f"bytes.minlen({m[f'{name}__minlen']})"
                f".maxlen({m[f'{name}__maxlen']})")
    return "any"


def suggest_elements(df: DataFrame, enum_max: int = 12,
                     enum_min_rows: int = 20) -> dict:
    """Per-column validr element strings (or isomorph sub-dicts for
    arrays).  One full-scan agg; plus one bounded distinct-collect over
    only the low-cardinality columns (≤ enum_max values each)."""
    types = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for name, dtype in types.items():
        aggs.extend(_agg_exprs(name, dtype))
    m = df.agg(*aggs).first().asDict()

    # enum candidates: low distinct estimate on string/int columns.
    # HLL error ~2% at default precision, so screen with head-room then
    # confirm with the exact bounded collect.
    cand = [n for n, t in types.items()
            if isinstance(t, _SUGGESTABLE_ENUM)
            and m.get(f"{n}__dv") is not None
            and m[f"{n}__dv"] <= enum_max * 2
            and m[f"{n}__n"] >= enum_min_rows]
    enum_values: dict[str, list] = {}
    if cand:
        # one small job: per-candidate distincts via a grouped collect_set
        # bounded by the cardinality screen above
        sets = df.agg(*[F.collect_set(F.col(n)).alias(n) for n in cand]) \
                 .first().asDict()
        for n, vals in sets.items():
            if vals and len(vals) <= enum_max and (
                    not isinstance(types[n], st.StringType)
                    or all(v and " " not in v for v in vals)):
                enum_values[n] = sorted(vals)

    out: dict[str, object] = {}
    for name, dtype in types.items():
        optional = (m[f"{name}__nulls"] or 0) > 0 or \
                   (m.get(f"{name}__empty") or 0) > 0
        if isinstance(dtype, st.ArrayType):
            if m.get(f"{name}__emin") is not None:
                kind = ("int" if isinstance(
                    dtype.elementType,
                    (st.IntegerType, st.LongType, st.ShortType, st.ByteType))
                    else "float")
                inner = (f"{kind}.min({_fmt(m[f'{name}__emin'])})"
                         f".max({_fmt(m[f'{name}__emax'])})")
            else:
                inner = "any"
            if m.get(f"{name}__minlen") is None:
                # all-NULL array column: no length envelope to draft
                self_el = "list"
            else:
                self_el = (f"list.minlen({m[f'{name}__minlen']})"
                           f".maxlen({m[f'{name}__maxlen']})")
            # list isomorph form: [self_element, item_element]
            out[name] = [self_el + (".optional" if optional else ""), inner]
        elif isinstance(dtype, st.StructType):
            sub = suggest_elements(df.select(f"{name}.*"),
                                   enum_max=enum_max,
                                   enum_min_rows=enum_min_rows)
            sub["$self"] = "dict" + (".optional" if optional else "")
            out[name] = sub
        else:
            el = _scalar_element(name, dtype, m, enum_values)
            if isinstance(el, list):           # enum list form
                if optional:
                    el = [el[0] + ".optional", *el[1:]]
                out[name] = el
            else:
                out[name] = el + (".optional" if optional else "")
    return out


def suggest_schema(df: DataFrame, enum_max: int = 12,
                   enum_min_rows: int = 20) -> Schema:
    """Draft Schema for ``df`` (see module docstring)."""
    iso = suggest_elements(df, enum_max=enum_max, enum_min_rows=enum_min_rows)
    iso["$self"] = "dict"
    return Schema.parse_isomorph_schema(iso)


def value_variants(df: DataFrame, col: str,
                   max_variants_shown: int = 8) -> DataFrame:
    """Spelling/casing/whitespace variant clusters in a categorical
    column: values that are IDENTICAL after casefold+trim+space-collapse
    but differ raw ("US", "us ", " u s"?no — "US"/"us"/"US ") — the
    enum-rot an `enum` validator then rejects row by row.  One row per
    cluster that has >1 raw form: the suggested canonical (most frequent
    raw form, ties to the lexicographically smallest), total rows,
    variant count, and a bounded sample of the raw forms with counts.

    Feed the output to a `regexp_replace`/`when` repair map, then pin the
    column with `T.enum(...)` (operators/suggest.suggest_elements will
    propose it once the variants collapse).

    Scale shape: one hash-agg on the raw value (shuffle ≤ distinct raw
    values), then a normalized-key agg over that value-sized table;
    the per-cluster variant list is bounded by ``max_variants_shown``
    via the same windowed-null trick as ``exact_duplicates`` — no
    unbounded collect state even if a key has 10^6 raw forms.
    """
    from pyspark.sql import Window
    raw = (df.filter(F.col(col).isNotNull())
           .groupBy(F.col(col).alias("raw"))
           .agg(F.count(F.lit(1)).alias("n")))
    norm = F.regexp_replace(F.lower(F.trim(F.col("raw"))), r"\s+", " ")
    keyed = raw.withColumn("key", norm)
    w = Window.partitionBy("key").orderBy(F.desc("n"), "raw")
    ranked = keyed.withColumn("_rk", F.row_number().over(w))
    return (ranked.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_variants"),
                 F.sum("n").alias("n_rows"),
                 F.first(F.when(F.col("_rk") == 1, F.col("raw")),
                         ignorenulls=True).alias("canonical"),
                 F.sort_array(F.collect_list(
                     F.when(F.col("_rk") <= max_variants_shown,
                            F.struct(F.col("_rk"), F.col("raw"),
                                     F.col("n"))))).alias("_vs"))
            .filter(F.col("n_variants") > 1)
            .select("key", "canonical", "n_variants", "n_rows",
                    F.transform("_vs", lambda s: s["raw"])
                    .alias("variants"))
            .orderBy(F.desc("n_rows"), "key"))
