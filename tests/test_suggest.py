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


def test_value_variants_clusters(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from validr_spark.operators.suggest import value_variants
    df = spark.createDataFrame(
        [("US",), ("US",), ("us",), ("US ",),
         ("uk",), ("UK",), ("UK",),
         ("DE",), (None,)],
        "country string")
    rows = {r["key"]: r for r in value_variants(df, "country").collect()}
    assert set(rows) == {"us", "uk"}        # DE has one form; NULL ignored
    us = rows["us"]
    assert us["canonical"] == "US"          # most frequent raw form
    assert us["n_variants"] == 3 and us["n_rows"] == 4
    assert us["variants"][0] == "US"        # rank order preserved
    uk = rows["uk"]
    assert uk["canonical"] == "UK" and uk["n_variants"] == 2


def test_value_variants_bounded_sample(spark):
    from validr_spark.operators.suggest import value_variants
    # 50 raw forms of one key: sample capped, counts still exact
    # forms "v<2k spaces>x" for k=1..49 all normalize to "v x" (the
    # k=0 form "vx" is its own single-variant cluster and is filtered)
    df = spark.createDataFrame(
        [(f"v{'  ' * (i % 50)}x",) for i in range(200)], "c string")
    rows = value_variants(df, "c", max_variants_shown=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["key"] == "v x"
    assert r["n_variants"] == 49 and r["n_rows"] == 196
    assert len(r["variants"]) == 5
