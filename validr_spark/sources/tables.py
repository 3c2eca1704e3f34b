"""Source/sink layer for the validation engine.

The north-rule input is "an Iceberg table of pre-tokenized training
sequences".  This sandbox has no Iceberg runtime jar, so the layer is
format-gated: ``iceberg`` identifiers are used when the catalog loads,
otherwise a partitioned-parquet layout with the same logical shape
(explicit partition column → partition pruning) stands in.  All engine
code above this layer sees only DataFrames and a partition-column name,
so swapping the format is a config change, not a code change.

Scale notes (100 TB target):
* Readers never infer schemas row-wise; parquet/Iceberg carry their own.
* ``predicate``/``columns`` are applied straight after ``load`` so Catalyst
  pushes filters and pruning into the scan (check ``PushedFilters`` /
  ``ReadSchema`` in ``.explain("formatted")``).
* Sinks default to partitioned writes with dynamic partition overwrite —
  the idempotency contract ``plans.manifest`` relies on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_PROBED: dict[int, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    key = id(spark)
    if key not in _ICEBERG_PROBED:
        try:
            spark.sql("SELECT 1").collect()
            jvm = spark.sparkContext._jvm
            jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.source.IcebergSource")
            _ICEBERG_PROBED[key] = True
        except Exception:
            _ICEBERG_PROBED[key] = False
    return _ICEBERG_PROBED[key]


_DATA_FILE_EXTS = (".parquet", ".pq", ".parq")
_EXT_FMTS = {".json": "json", ".jsonl": "json", ".ndjson": "json",
             ".csv": "csv"}


def validr_read_schema(schema):
    """Expected-input ``StructType`` for semi-structured reads, derived
    from a validr schema tree — every leaf is a STRING.

    Rationale: the reference's primary use case is validating untyped
    JSON payloads, and its validators ACCEPT strings and coerce
    (``int("3")`` → 3, pyx:763-785 etc.).  Reading JSON/CSV with
    all-string leaves therefore (a) needs zero row-wise schema inference
    (the explicit schema reaches the scan), and (b) loses nothing: the
    compiled validation plan IS the typed parser, applying exactly the
    reference's str-accepting coercion, so a JSON ``123`` and ``"123"``
    both validate to the same long.

    Containers map structurally: fixed ``dict`` → struct, ``list`` →
    array, dynamic ``dict`` (``.key()/.value()``) → map<string,string>,
    ``model`` → the struct of its declared fields (a model IS a dict
    schema with attribute access), and ``union`` → **variant**: the one
    Spark type that defers the shape decision to runtime, exactly what a
    sum type needs.  Spark 4's JSON reader parses a ``VariantType`` field
    natively (no inference pass), and the compiler's
    ``_union_variant_core`` path then does true per-row shape dispatch
    via ``schema_of_variant``/``try_variant_get`` — so an isomorph-JSON
    union schema (reference schema.py:308-350 shape forms) round-trips
    file → variant column → per-shape violations end-to-end.
    """
    from pyspark.sql import types as st

    from validr_spark.schema import Schema, T, _as_schema

    def node(s) -> st.DataType:
        s = _as_schema(s)
        if not isinstance(s, Schema):
            raise TypeError(f"not a schema: {s!r}")
        v = s.validator
        if v == "model":
            # same unwrap the compiler does (compiler.py compile_node):
            # a model reads as the struct of its declared fields
            return node(T(s.items).__schema__)
        if v == "dict":
            if isinstance(s.items, dict) and s.items:
                return st.StructType([
                    st.StructField(k, node(c)) for k, c in s.items.items()])
            return st.MapType(st.StringType(), st.StringType())
        if v == "list":
            inner = s.items if s.items is not None else None
            return st.ArrayType(node(inner) if inner is not None
                                else st.StringType())
        if v == "union":
            if isinstance(s.items, dict):
                # tagged form dispatches on the `by` field of a STRUCT:
                # read the union of every branch's fields (all-string
                # leaves; absent fields parse as null) plus the tag
                by = s.params.get("by")
                fields: dict[str, st.DataType] = {by: st.StringType()}
                for sub in s.items.values():
                    body = (sub if sub.validator == "dict"
                            else T(sub.items).__schema__)
                    for k, c in (body.items or {}).items():
                        fields.setdefault(k, node(c))
                return st.StructType([st.StructField(k, t)
                                      for k, t in fields.items()])
            # shape (list) form: variant defers the shape decision to
            # runtime — _union_variant_core dispatches per row
            return st.VariantType()
        return st.StringType()

    root = node(schema)
    from pyspark.sql import types as st2
    if not isinstance(root, st2.StructType):
        raise TypeError("root schema must be a fixed dict "
                        "(rows need named columns)")
    return root


def _looks_like_catalog_ident(spark: SparkSession, location: str) -> bool:
    """fmt='auto' disambiguation: treat `location` as a catalog identifier
    only when it is dotted, path-free, not a known data-file extension,
    and does not exist on the filesystem — so relative paths like
    ``data.parquet`` or ``out.pq`` still read as parquet."""
    if "/" in location or "." not in location:
        return False
    if location.lower().endswith(_DATA_FILE_EXTS):
        return False
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(location)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(p):
            return False
    except Exception:
        pass
    return True


def read_table(spark: SparkSession, location: str, fmt: str = "auto",
               columns: list[str] | None = None,
               predicate: str | None = None,
               options: dict | None = None,
               schema=None, corrupt_col: str | None = None) -> DataFrame:
    """Load a table; push projection/predicate into the scan immediately.

    ``fmt='auto'``: ``.json/.jsonl/.ndjson/.csv`` extensions pick their
    reader; anything else that exists on the filesystem (or looks like
    a path / a data file) reads as parquet; only dotted identifiers that
    do NOT exist as files resolve via ``spark.table`` (Iceberg/hive).
    Catalog identifiers that shadow a local path need ``fmt='table'``.

    ``schema``: explicit read schema for schemaless formats (JSON/CSV) —
    a DDL string, a ``StructType``, or a validr schema/builder (mapped to
    all-string leaves via :func:`validr_read_schema` so the validation
    plan does the typed coercion).  Never pass None for JSON/CSV at
    scale: schema inference is an extra full scan.

    ``corrupt_col``: JSON/CSV only (requires ``schema``) — capture rows
    the parser could not decode at all (truncated JSON, wrong column
    count) verbatim in this extra string column instead of silently
    nulling them (PERMISSIVE mode's default).  A validation engine must
    not lose its most broken rows before validation starts; filter
    ``col(corrupt_col).isNotNull()`` into the quarantine path.  Spark
    refuses queries that reference ONLY the corrupt column on the raw
    scan (SPARK-21610) — keep at least one data column in such filters
    or persist first.
    """
    if fmt == "auto":
        low = location.lower()
        fmt = next((f for ext, f in _EXT_FMTS.items() if low.endswith(ext)),
                   "auto")
    if fmt == "auto":
        fmt = "table" if _looks_like_catalog_ident(spark, location) \
            else "parquet"
    if corrupt_col is not None and fmt not in ("json", "csv"):
        raise ValueError(
            f"corrupt_col only applies to JSON/CSV parsing (fmt={fmt!r}): "
            "self-describing formats have no parser-corrupt-record notion")
    if fmt == "table" or (fmt == "iceberg" and iceberg_available(spark)):
        df = spark.table(location)
    elif fmt == "parquet" or fmt == "iceberg":  # iceberg fallback
        reader = spark.read
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        df = reader.parquet(location)
    else:
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", "true")
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        if schema is not None:
            # convert lazily, only where a read schema is actually used:
            # parquet/table branches ignore `schema` (they carry their
            # own), so a union/model validr schema there must not raise
            from pyspark.sql.types import StringType, StructField, StructType
            if isinstance(schema, str):
                schema = StructType.fromDDL(schema)
            elif not isinstance(schema, StructType):
                schema = validr_read_schema(schema)
            if corrupt_col is not None:
                if corrupt_col not in schema.fieldNames():
                    schema = StructType(
                        list(schema.fields)
                        + [StructField(corrupt_col, StringType(), True)])
                reader = (reader.option("mode", "PERMISSIVE")
                          .option("columnNameOfCorruptRecord", corrupt_col))
            reader = reader.schema(schema)
        elif corrupt_col is not None:
            raise ValueError("corrupt_col requires an explicit schema "
                             "(inference would need an extra full scan)")
        df = reader.load(location)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def write_table(df: DataFrame, location: str, fmt: str = "parquet",
                mode: str = "append", partition_by: list[str] | None = None,
                dynamic_overwrite: bool = True) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if mode == "overwrite" and dynamic_overwrite:
            writer = writer.option("partitionOverwriteMode", "dynamic")
    if fmt == "parquet":
        writer.parquet(location)
    elif fmt == "iceberg":
        writer.format("iceberg").save(location)
    else:
        writer.format(fmt).save(location)


def write_bucketed(df: DataFrame, table: str, bucket_by: list[str] | str,
                   num_buckets: int = 64, sort_by: list[str] | str | None = None,
                   mode: str = "overwrite", fmt: str = "parquet",
                   path: str | None = None) -> None:
    """Write a hash-bucketed (optionally sorted) catalog table.

    THE shuffle killer for repeated joins: two tables bucketed on the
    same key with the same bucket count join with NO exchange on either
    side — each task reads matching bucket files directly (and with
    ``sort_by`` on the key, no sort either).  At 100 TB this turns every
    recurring fact⋈fact join (e.g. re-validating against yesterday's
    fingerprints, diffing table versions) from a full-corpus shuffle into
    a co-located merge.  Bucketing requires the table catalog
    (``saveAsTable``); pass ``path`` to keep the data in an external
    location.  Plan-shape: see the no-Exchange join test.
    """
    if isinstance(bucket_by, str):
        bucket_by = [bucket_by]
    writer = df.write.mode(mode).format(fmt) \
        .bucketBy(num_buckets, *bucket_by)
    if sort_by:
        if isinstance(sort_by, str):
            sort_by = [sort_by]
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


@dataclass
class TableSource:
    """A named, partitioned input table (the engine's scan unit)."""

    location: str
    fmt: str = "auto"
    partition_col: str | None = None
    columns: list[str] | None = None
    predicate: str | None = None
    options: dict = field(default_factory=dict)

    schema: object | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        return read_table(spark, self.location, self.fmt,
                          columns=self.columns, predicate=self.predicate,
                          options=self.options, schema=self.schema)


@dataclass
class TableSink:
    """A partitioned output table (violations / manifest / clean rows)."""

    location: str
    fmt: str = "parquet"
    mode: str = "overwrite"
    partition_by: list[str] | None = None

    def write(self, df: DataFrame) -> None:
        write_table(df, self.location, self.fmt, self.mode,
                    self.partition_by)
