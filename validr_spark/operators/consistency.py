"""Cross-column row invariants (e.g. ``n_tok == size(tokens)``).

A row invariant is a boolean Column expression; failures become violation
rows in the engine's (id, rule_id, position, message, value) shape.  Pure
projection+filter — no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_invariants(df: DataFrame, invariants: dict[str, Column],
                     id_cols: list[str] | str = ()) -> DataFrame:
    """``invariants``: {rule_id: ok_condition}. Returns violation rows."""
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    parts = []
    for rule_id, ok in invariants.items():
        field = rule_id.split(".", 1)[0]
        parts.append(
            F.when(~F.coalesce(ok, F.lit(False)), F.struct(
                F.lit(rule_id).alias("rule_id"),
                F.lit(field).alias("position"),
                F.lit(f"invariant {rule_id} violated").alias("message"),
            )))
    found = F.filter(F.array(*parts), lambda v: v.isNotNull())
    return (df.select(*id_cols, F.explode(found).alias("v"))
            .select(*id_cols, "v.rule_id", "v.position", "v.message"))


def n_tok_consistency(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The north-star invariant on the sequences table."""
    return check_invariants(
        df, {"n_tok.consistent": F.col("n_tok") == F.size("tokens")},
        id_cols=id_col)
