"""Referential-integrity checks: fact.key ⊆ dim.key.

The dimension side is broadcast by default (a source/enum dimension is
small by construction), so the check is a map-side broadcast anti-join —
zero shuffle of the fact table at any scale.  Set ``broadcast=False`` for a
large dimension; AQE then picks the join strategy and handles skewed keys
(``spark.sql.adaptive.skewJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphans(fact: DataFrame, dim: DataFrame, on, broadcast: bool = True) -> DataFrame:
    """Rows of ``fact`` whose key has no match in ``dim`` (left anti join)."""
    d = F.broadcast(dim) if broadcast else dim
    return fact.join(d, on=on, how="left_anti")


def orphan_count(fact: DataFrame, dim: DataFrame, on,
                 broadcast: bool = True) -> DataFrame:
    return orphans(fact, dim, on, broadcast).agg(
        F.count(F.lit(1)).alias("n_orphans"))


def orphan_violations(fact: DataFrame, dim: DataFrame, key: str,
                      id_col: str, broadcast: bool = True) -> DataFrame:
    """Orphans as violation rows matching the engine's violations schema."""
    return orphans(fact, dim, key, broadcast).select(
        F.col(id_col),
        F.lit(f"{key}.referential").alias("rule_id"),
        F.lit(key).alias("position"),
        F.lit(f"value not present in dimension {key}").alias("message"),
        F.col(key).cast("string").alias("value"),
    )
