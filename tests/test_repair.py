"""Bulk repair loop: repairing_schema transform + repair() split/report."""

import pytest

from validr_spark import T, SparkCompiler
from validr_spark.operators.repair import (RepairResult, repair,
                                           repairing_schema)
from validr_spark.testing import assert_no_python, assert_no_shuffle


def schema():
    return T.dict(
        doc_id=T.str.minlen(1).maxlen(8),
        n_tok=T.int.min(1).max(100).default(50),     # repairable
        lang=T.enum("en de fr").default("en"),       # repairable
        score=T.float.min(0).max(1),                 # NOT repairable
        note=T.str.maxlen(4).optional,               # repairable only
    )                                                # with optional-null


@pytest.fixture()
def df(spark):
    rows = [
        ("ok", 10, "en", 0.5, "a"),          # fully valid
        ("bad1", 999, "en", 0.5, "a"),       # n_tok out of range → default
        ("bad2", 10, "xx", 0.5, "a"),        # bad enum → default
        ("bad3", 10, "en", 7.5, "a"),        # bad score → IRREPARABLE
        ("bad4", 999, "xx", 0.5, "a"),       # two repairable failures
        ("bad5", 10, "en", 0.5, "toolong"),  # optional field invalid
    ]
    return spark.createDataFrame(
        rows, "doc_id string, n_tok int, lang string, score double, "
              "note string")


def test_repairing_schema_marks_defaults_only():
    r = repairing_schema(schema())
    f = r.items
    assert f["n_tok"].params.get("invalid_to_default") is True
    assert f["lang"].params.get("invalid_to_default") is True
    assert not f["score"].params.get("invalid_to_default")
    assert not f["note"].params.get("invalid_to_default")
    # optional-null mode additionally marks optional fields
    r2 = repairing_schema(schema(), use_optional_null=True)
    assert r2.items["note"].params.get("invalid_to_default") is True
    assert not r2.items["score"].params.get("invalid_to_default")
    # original schema untouched (transform copies)
    assert not schema().__schema__.items["n_tok"].params.get(
        "invalid_to_default")


def test_repairing_schema_preserves_existing_invalid_to():
    s = T.dict(x=T.int.min(0).invalid_to(0).default(1)).__schema__
    r = repairing_schema(s)
    assert r.items["x"].params["invalid_to"] == 0
    assert not r.items["x"].params.get("invalid_to_default")


def test_repairing_schema_recurses_list():
    s = T.dict(xs=T.list(T.int.min(0).max(9).default(0))).__schema__
    r = repairing_schema(s)
    assert r.items["xs"].items.params.get("invalid_to_default") is True


def test_repair_splits_and_substitutes(spark, df):
    out = repair(schema(), df, id_cols=["doc_id"])
    assert isinstance(out, RepairResult)
    rep = {r["doc_id"]: r for r in out.repaired.collect()}
    # valid row passes through untouched
    assert rep["ok"]["n_tok"] == 10 and rep["ok"]["lang"] == "en"
    # out-of-range n_tok repaired to its declared default
    assert rep["bad1"]["n_tok"] == 50
    # bad enum repaired to its default
    assert rep["bad2"]["lang"] == "en"
    # both repairable failures fixed in one pass
    assert rep["bad4"]["n_tok"] == 50 and rep["bad4"]["lang"] == "en"
    # score has no default → row stays irreparable; note is optional
    # but optional-null repair is off by default
    assert set(rep) == {"ok", "bad1", "bad2", "bad4"}
    irr = {r["doc_id"] for r in out.irreparable.collect()}
    assert irr == {"bad3", "bad5"}
    remaining_rules = {r["rule_id"] for r in out.remaining.collect()}
    assert remaining_rules == {"score.max", "note.maxlen"}


def test_repair_optional_null_mode(spark, df):
    out = repair(schema(), df, id_cols=["doc_id"], use_optional_null=True)
    rep = {r["doc_id"]: r for r in out.repaired.collect()}
    # the invalid optional value is repaired to the optional-null result
    # (reference semantics: an optional str's null value is "")
    assert "bad5" in rep and rep["bad5"]["note"] == ""
    assert {r["doc_id"] for r in out.irreparable.collect()} == {"bad3"}


def test_repair_report_accounting(spark, df):
    strict = SparkCompiler().compile(schema())
    strict_v = strict.apply(df, id_cols=["doc_id"]).violations()
    out = repair(schema(), df, id_cols=["doc_id"])
    rows = {r["rule_id"]: r for r in out.report(strict_v).collect()}
    assert rows["n_tok.max"]["n_before"] == 2
    assert rows["n_tok.max"]["n_after"] == 0
    assert rows["n_tok.max"]["n_repaired"] == 2
    assert rows["lang.enum"]["n_repaired"] == 2
    assert rows["score.max"]["n_before"] == 1
    assert rows["score.max"]["n_after"] == 1
    assert rows["score.max"]["n_repaired"] == 0


def test_repair_plan_is_scan_side(spark, df):
    out = repair(schema(), df, id_cols=["doc_id"])
    assert_no_python(out.repaired)
    assert_no_shuffle(out.repaired)


def test_repairing_schema_recurses_model(spark):
    """Model-typed schemas repair like their dict equivalent: the model
    node unwraps to its __schema__ dict and fields with defaults get
    invalid_to_default (review finding, round 3 — the elif chain
    previously skipped 'model' entirely, making every failing row
    irreparable despite declared defaults)."""
    from validr_spark import T, modelclass
    from validr_spark.operators.repair import repair, repairing_schema

    @modelclass
    class Doc:
        doc_id = T.str.minlen(1).maxlen(8)
        n_tok = T.int.min(1).max(100).default(50)

    rs = repairing_schema(T(Doc).__schema__)
    assert rs.validator == "dict"
    assert rs.items["n_tok"].params.get("invalid_to_default") is True
    assert "invalid_to_default" not in rs.items["doc_id"].params

    df = spark.createDataFrame([("ok", 10), ("fix", 999), ("", 10)],
                               "doc_id string, n_tok int")
    out = repair(Doc, df, id_cols=["doc_id"])
    rep = {r["doc_id"]: r for r in out.repaired.collect()}
    assert set(rep) == {"ok", "fix"}
    assert rep["fix"]["n_tok"] == 50
    assert out.irreparable.count() == 1
