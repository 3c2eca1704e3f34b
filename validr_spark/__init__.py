"""validr_spark — a PySpark-native distributed constraint-validation engine.

Schema definitions (same authoring surface as guyskk/validr: the fluent `T`
builder, element strings, isomorph JSON) compile into Catalyst Column
expressions + vectorized pandas/Arrow UDF batches, producing per-row coerced
output, a violations DataFrame (doc_id, rule_id, position, message, value),
per-partition pass/fail verdicts, and dataset-level checks: column stats,
uniqueness, referential integrity, and distribution drift.
"""

from .errors import (
    Invalid,
    ModelInvalid,
    SchemaError,
    ValidrError,
    mark_index,
    mark_key,
)
from .pyvalidate import (
    Compiler,
    builtin_validators,
    create_enum_validator,
    create_re_validator,
    validator,
)
from .schema import Builder, Schema, T
from .schemadiff import diff_verdict, needs_revalidation, schema_diff

__version__ = "0.4.0"

__all__ = [
    "T", "Schema", "Builder", "Compiler",
    "Invalid", "ModelInvalid", "SchemaError", "ValidrError",
    "mark_index", "mark_key",
    "validator", "builtin_validators",
    "create_re_validator", "create_enum_validator",
    "SparkCompiler", "ValidationPlan",
    "fields", "asdict", "modelclass",
    "schema_diff", "diff_verdict", "needs_revalidation",
]


def __getattr__(name):
    # lazy: keep pyspark import out of pure-driver use (schema authoring)
    if name in ("SparkCompiler", "ValidationPlan", "ValidationResult"):
        from . import compiler

        return getattr(compiler, name)
    if name in ("modelclass", "fields", "asdict"):
        from . import model

        return getattr(model, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
