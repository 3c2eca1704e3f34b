"""Column statistics (null rate, min/max, length distribution).

One full-scan aggregation job: every metric is an algebraic aggregate, so
Spark computes map-side partials and reduces — the shuffle carries one row
per partition, never data rows.  At 10^12 rows this is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as st


def _metrics_for(df: DataFrame, name: str, dtype: st.DataType):
    c = F.col(name)
    is_null = c.isNull()
    if isinstance(dtype, st.StringType):
        is_null = is_null | (c == "")
        measure = F.char_length(c)
    elif isinstance(dtype, st.ArrayType):
        measure = F.size(c)
    elif isinstance(dtype, (st.NumericType,)):
        measure = c.cast("double")
    else:
        measure = F.lit(None).cast("double")
    return [
        F.count(F.lit(1)).alias(f"{name}__count"),
        F.sum(is_null.cast("long")).alias(f"{name}__nulls"),
        F.min(measure).cast("double").alias(f"{name}__min"),
        F.max(measure).cast("double").alias(f"{name}__max"),
        F.avg(measure).alias(f"{name}__avg"),
        F.expr(f"approx_count_distinct({name})").alias(f"{name}__approx_distinct")
        if not isinstance(dtype, st.ArrayType)
        else F.lit(None).cast("long").alias(f"{name}__approx_distinct"),
    ]


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column.

    Columns: (column, n_rows, n_nulls, null_rate, min, max, avg,
    approx_distinct).  min/max/avg are over the value for numerics, the
    char length for strings, the size for arrays.
    """
    types = {f.name: f.dataType for f in df.schema.fields}
    columns = columns or list(types)
    aggs = []
    for name in columns:
        aggs.extend(_metrics_for(df, name, types[name]))
    row = df.agg(*aggs)
    per_col = []
    for name in columns:
        per_col.append(F.struct(
            F.lit(name).alias("column"),
            F.col(f"{name}__count").alias("n_rows"),
            F.col(f"{name}__nulls").alias("n_nulls"),
            (F.col(f"{name}__nulls") / F.col(f"{name}__count"))
            .alias("null_rate"),
            F.col(f"{name}__min").alias("min"),
            F.col(f"{name}__max").alias("max"),
            F.col(f"{name}__avg").alias("avg"),
            F.col(f"{name}__approx_distinct").alias("approx_distinct"),
        ))
    return (row.select(F.explode(F.array(*per_col)).alias("m"))
            .select("m.*"))


def null_rates(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, null_rate) — '' counts as null for strings."""
    return column_profile(df, columns).select(
        "column", "n_rows", "n_nulls", "null_rate")


def length_distribution(df: DataFrame, column: str,
                        probabilities: list[float] | None = None,
                        relative_error: float = 0.001,
                        exact: bool = False) -> DataFrame:
    """Quantiles of a length-like column.

    Default: ``percentile_approx`` sketch (mergeable, one-pass — the only
    sane choice at 10^12 rows).  ``exact=True`` uses the exact
    ``percentile`` aggregate (linear interpolation, matches DuckDB's
    quantile_cont) for small-scale oracle comparison.
    """
    probabilities = probabilities or [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    dtype = dict((f.name, f.dataType) for f in df.schema.fields)[column]
    c = F.col(column)
    if isinstance(dtype, st.StringType):
        c = F.char_length(c)
    elif isinstance(dtype, st.ArrayType):
        c = F.size(c)
    probs = "array(" + ", ".join(map(str, probabilities)) + ")"
    fn = (f"percentile(x, {probs})" if exact
          else f"percentile_approx(x, {probs}, {int(1.0 / relative_error)})")
    return df.select(c.alias("x")).agg(F.expr(fn).alias("quantiles"))
