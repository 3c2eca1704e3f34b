"""Dynamic dict (.key/.value schemas) over MapType columns — Spark backend
(reference dynamic-dict semantics: pyx:544-596, tests/validators/test_dict.py
57-99)."""

import pytest
from pyspark.sql import functions as F

from validr_spark import T
from validr_spark.compiler import SparkCompiler


def _run(spark, schema, data, map_type="map<string,string>"):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(data)],
                               f"_id long, props {map_type}")
    plan = SparkCompiler().compile(T.dict(props=schema))
    return plan.apply(df, id_cols=["_id"])


def test_value_schema_validates_entries(spark):
    res = _run(spark, T.dict.value(T.int.min(0).max(9)),
               [{"a": "3", "b": "7"}, {"a": "12"}, {"x": "oops"}])
    out = {r["_id"]: r for r in res.df.collect()}
    assert out[0]["props"] == {"a": 3, "b": 7}
    v1 = out[1]["_violations"]
    assert v1[0]["rule_id"] == "props.$self_value.max"
    assert v1[0]["position"] == "props.a"
    assert v1[0]["message"] == "value must <= 9"
    v2 = out[2]["_violations"]
    assert v2[0]["position"] == "props.x"


def test_key_schema_validates_keys(spark):
    res = _run(spark, T.dict.key(T.str.maxlen(2)),
               [{"ab": "1"}, {"toolong": "1"}])
    out = {r["_id"]: r for r in res.df.collect()}
    assert out[0]["_violations"] == [] and out[0]["props"] == {"ab": "1"}
    v = out[1]["_violations"]
    assert v[0]["rule_id"] == "props.$self_key.maxlen"
    assert v[0]["position"] == "props.$self_key"


def test_map_length_bounds(spark):
    res = _run(spark, T.dict.value(T.str).maxlen(2).minlen(1),
               [{"a": "1"}, {"a": "1", "b": "2", "c": "3"}, {}])
    out = {r["_id"]: r for r in res.df.collect()}
    assert out[0]["_violations"] == []
    assert out[1]["_violations"][0]["message"] == "dict length must <= 2"
    assert out[2]["_violations"][0]["message"] == "dict length must >= 1"


def test_slim_drops_empty_values(spark):
    res = _run(spark, T.dict.value(T.str.optional).slim,
               [{"a": "x", "b": "", "c": None}])
    row = res.df.collect()[0]
    assert row["props"] == {"a": "x"}
    assert row["_violations"] == []


def test_map_optional_and_null(spark):
    res = _run(spark, T.dict.value(T.int).optional, [None])
    row = res.df.collect()[0]
    assert row["props"] is None and row["_violations"] == []
    res2 = _run(spark, T.dict.value(T.int), [None])
    assert res2.df.collect()[0]["_violations"][0]["message"] == "required"


def test_map_int_values_coerce_type(spark):
    res = _run(spark, T.dict.value(T.float.min(0)),
               [{"a": 1, "b": 2}], map_type="map<string,int>")
    row = res.df.collect()[0]
    assert row["props"] == {"a": 1.0, "b": 2.0}


def test_parity_with_python_backend(spark):
    """Same inputs through pyvalidate: outcome equality (first error)."""
    from validr_spark.errors import Invalid
    from validr_spark.pyvalidate import Compiler as PyCompiler

    schema = T.dict.key(T.str.maxlen(4)).value(T.int.min(0).max(99))
    py = PyCompiler().compile(schema)
    data = [{"ok": "5"}, {"ok": "120"}, {"waytoolong": "1"}]
    res = _run(spark, schema, data)
    rows = {r["_id"]: r for r in res.df.collect()}
    for i, d in enumerate(data):
        try:
            expect = py(dict(d))
            assert list(rows[i]["_violations"]) == []
            assert rows[i]["props"] == expect
        except Invalid as ex:
            got = rows[i]["_violations"][0]
            assert got["message"] == ex.message
            assert got["position"] == f"props.{ex.position}"
