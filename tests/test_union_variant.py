"""Runtime shape-dispatched union over VariantType columns
(parse_json ingest) — per-row dispatch via schema_of_variant."""
import pytest
from pyspark.sql import functions as F

from validr_spark import T
from validr_spark.compiler import SparkCompiler
from validr_spark.errors import SchemaError


def _variant_df(spark, payloads):
    rows = [(i, j) for i, j in enumerate(payloads)]
    return (spark.createDataFrame(rows, "id long, j string")
            .select("id", F.parse_json("j").alias("val")))


@pytest.fixture(scope="module")
def plan():
    return SparkCompiler().compile(T.dict(val=T.union([
        T.int.min(0).max(9),
        T.list(T.int.min(0).max(10)),
        T.dict(a=T.int.min(0)),
    ]).optional))


def test_runtime_dispatch_per_row(spark, plan):
    df = _variant_df(spark, ['5', '[1,2,3]', '{"a":7}', 'null', '"7"'])
    res = plan.apply(df, id_cols=["id"])
    assert res.violations().count() == 0
    clean = {r["id"]: r["val"] for r in res.clean().collect()}
    assert clean[0]["scalar"] == 5 and clean[0]["list"] is None
    assert list(clean[1]["list"]) == [1, 2, 3]
    assert clean[2]["dict"]["a"] == 7
    assert clean[3] is None                      # variant null + optional
    assert clean[4]["scalar"] == 7               # "7" coerces via string path


def test_branch_violations_carry_positions(spark, plan):
    df = _variant_df(spark, ['"abc"', '[1,99]', '{"a":-1}', '12'])
    v = {r["id"]: r for r in
         plan.apply(df, id_cols=["id"]).violations().collect()}
    assert v[0]["rule_id"] == "val.type"         # scalar branch: invalid int
    assert v[1]["position"] == "val[1]"          # element index survives
    assert v[1]["message"] == "value must <= 10"
    assert v[2]["position"] == "val.a"
    assert v[3]["message"] == "value must <= 9"


def test_missing_shape_branch_rejected(spark):
    plan = SparkCompiler().compile(T.dict(val=T.union([
        T.int.min(0),
    ]).optional))
    df = _variant_df(spark, ['[1,2]', '{"a":1}', '3'])
    v = {r["id"]: r for r in
         plan.apply(df, id_cols=["id"]).violations().collect()}
    assert v[0]["message"] == "not allowed list"
    assert v[1]["message"] == "not allowed dict"
    assert 2 not in v


def test_required_variant_null(spark):
    plan = SparkCompiler().compile(T.dict(val=T.union([T.int])))
    df = _variant_df(spark, ['null', '4'])
    v = plan.apply(df, id_cols=["id"]).violations().collect()
    assert len(v) == 1
    assert v[0]["id"] == 0 and v[0]["message"] == "required"


def test_ambiguous_union_still_schema_error(spark):
    with pytest.raises(SchemaError, match="ambiguous"):
        SparkCompiler().compile(
            T.dict(val=T.union([T.int, T.str])))


def test_documented_float_divergence(spark, plan):
    # reference: int(3.5) -> 3; variant string extraction rejects — pinned
    df = _variant_df(spark, ['3.5'])
    v = plan.apply(df, id_cols=["id"]).violations().collect()
    assert len(v) == 1 and v[0]["message"] == "invalid int"
