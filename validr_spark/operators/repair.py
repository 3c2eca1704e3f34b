"""Bulk repair of quarantined rows with the schema's own declared defaults.

The production loop at 10^12 rows is: validate STRICTLY (so the audit
trail records every violation), quarantine failing rows in coerced shape
(plans/manifest.py quarantine sink), bulk-repair the repairable ones
offline, re-ingest what repaired cleanly.  The reference repairs inline
via the ``invalid_to`` / ``invalid_to_default`` params (reference
src/validr/_validator_c.pyx:381-421 wrapper semantics, which
compiler._wrap reproduces); this module lifts those same markers into
the offline batch step, so a pipeline can keep its primary validation
strict and still recover rows whose schema declares a safe substitute.

Plan shape: ONE Catalyst projection per plan application over the
quarantine scan — no shuffle, no UDFs beyond what the schema's own
validators demand.  The repair report is a join of two rule_id-sized
aggregates (thousands of rows at most).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import Schema

__all__ = ["repairing_schema", "repair", "RepairResult"]


def repairing_schema(schema, *, use_optional_null: bool = False) -> Schema:
    """Copy of ``schema`` where every scalar field that declares a
    ``default`` also suppresses violations with ``invalid_to_default``
    (validr semantics: an invalid value is replaced by the field's
    default instead of erroring).

    Fields that already carry ``invalid_to``/``invalid_to_default`` are
    left as-is — they repair themselves during strict validation.
    ``use_optional_null=True`` additionally treats *optional* fields
    (no default) as repairable-to-null; off by default because nulling
    a corrupt value loses information a default does not.

    Containers recurse: dict fields, list items, and model fields (a
    ``model`` node is unwrapped to its equivalent dict schema — the
    compiler compiles both through the same ``_dict_core`` with the same
    rule_ids, and a model node's items slot can only legally hold a
    model class, not a transformed schema) are transformed; union
    branches are NOT (which branch a repaired value belongs to is
    ambiguous — repair unions by repairing the branch schemas before
    composing them).
    """
    s = schema.__schema__ if hasattr(schema, "__schema__") else schema
    if s.validator == "model" and s.items is not None:
        from ..schema import T
        return repairing_schema(T(s.items).__schema__,
                                use_optional_null=use_optional_null)
    params = dict(s.params)
    items = s.items
    if s.validator == "dict" and isinstance(items, dict):
        items = {k: repairing_schema(v, use_optional_null=use_optional_null)
                 for k, v in items.items()}
    elif s.validator == "list" and isinstance(items, Schema):
        items = repairing_schema(items, use_optional_null=use_optional_null)
    elif s.validator not in (None, "union", "model"):
        already = "invalid_to" in params or params.get("invalid_to_default")
        has_default = params.get("default") not in (None, "")
        if not already and (has_default
                            or (use_optional_null
                                and params.get("optional"))):
            params["invalid_to_default"] = True
    return Schema(validator=s.validator, items=items, params=params)


@dataclass
class RepairResult:
    """Outcome of a bulk repair pass."""

    repaired: DataFrame      # rows now fully valid, repaired/coerced shape
    irreparable: DataFrame   # rows still failing after repair, coerced
    remaining: DataFrame     # violations that survived the repair pass
    # the shared annotated parent all three views derive from — persist
    # THIS before consuming more than one view, or each view re-runs the
    # whole lenient validation over the input scan
    annotated: DataFrame | None = None

    def report(self, strict_violations: DataFrame) -> DataFrame:
        """Per-rule repair accounting: join the strict pass's violations
        (``n_before``) against what still fails after repair
        (``n_after``); ``n_repaired`` is the difference.  Both inputs
        aggregate to |rules| rows before the join — nothing row-shaped
        moves.
        """
        before = (strict_violations.groupBy("rule_id")
                  .agg(F.count(F.lit(1)).alias("n_before")))
        after = (self.remaining.groupBy("rule_id")
                 .agg(F.count(F.lit(1)).alias("n_after")))
        return (before.join(after, "rule_id", "full_outer")
                .fillna(0, subset=["n_before", "n_after"])
                .select("rule_id", "n_before", "n_after",
                        (F.col("n_before") - F.col("n_after"))
                        .alias("n_repaired"))
                .orderBy("rule_id"))


def repair(schema, df: DataFrame, id_cols: list[str] | None = None,
           *, use_optional_null: bool = False) -> RepairResult:
    """Validate ``df`` under :func:`repairing_schema` and split it into
    repaired (now-clean) rows and irreparable ones.

    ``df`` is usually the quarantine sink's coerced rows, but any table
    in the schema's input shape works — already-valid rows pass through
    untouched (a default only replaces an INVALID value).  ``id_cols``
    follows ValidationPlan.apply: columns copied through untouched so
    violations/rows stay joinable to the source.
    """
    from ..compiler import SparkCompiler

    lenient = SparkCompiler().compile(
        repairing_schema(schema, use_optional_null=use_optional_null))
    res = lenient.apply(df, id_cols=id_cols or [])
    return RepairResult(repaired=res.clean(),
                        irreparable=res.bad_rows(),
                        remaining=res.violations(),
                        annotated=res.df)
