"""Schema suggestion: profile → validr schema draft → compiles & accepts
the profiled data."""
import pytest

from validr_spark.compiler import SparkCompiler
from validr_spark.operators.suggest import suggest_elements, suggest_schema
from validr_spark.schema import Schema


@pytest.fixture(scope="module")
def df(spark):
    rows = [(f"doc-{i:03d}",
             "x" * (5 + i % 20),
             ["en", "zh", "de"][i % 3],
             float(i) / 7.0,
             None if i % 10 == 0 else i % 50,
             list(range(i % 6 + 1)))
            for i in range(100)]
    return spark.createDataFrame(
        rows, "doc_id string, text string, lang string, score double, "
              "n int, toks array<int>")


def test_suggested_elements(spark, df):
    els = suggest_elements(df)
    assert els["doc_id"] == "str.minlen(7).maxlen(7)"
    assert els["text"] == "str.minlen(5).maxlen(24)"
    assert els["lang"] == ["enum", "de", "en", "zh"]
    assert els["score"].startswith("float.min(0")
    assert els["n"] == "int.min(1).max(49).optional"   # nulls observed
    assert els["toks"] == ["list.minlen(1).maxlen(6)", "int.min(0).max(5)"]


def test_draft_compiles_and_accepts_profiled_data(spark, df):
    schema = suggest_schema(df)
    plan = SparkCompiler().compile(schema)
    res = plan.apply(df, id_cols=["doc_id"])
    # the draft is the observed envelope: zero violations on the sample
    assert res.violations().count() == 0


def test_draft_round_trips_as_json(spark, df):
    schema = suggest_schema(df)
    prim = schema.to_primitive()
    again = Schema.parse_isomorph_schema(prim)
    assert again.to_primitive() == prim


def test_draft_flags_out_of_envelope_rows(spark, df):
    schema = suggest_schema(df)
    plan = SparkCompiler().compile(schema)
    bad = spark.createDataFrame(
        [("toolongid-xxx", "tiny", "fr", 99.9, 500, list(range(20)))],
        df.schema)
    v = plan.apply(bad, id_cols=["doc_id"]).violations()
    positions = {r["position"] for r in v.collect()}
    # every out-of-envelope field is caught
    assert {"doc_id", "lang", "score", "n", "toks"} <= positions


def test_enum_not_suggested_for_high_cardinality(spark, df):
    els = suggest_elements(df, enum_max=2)
    assert els["lang"].startswith("str.")  # 3 distinct > 2 → plain str
