"""Schema-evolution diff (validr_spark/schemadiff.py) — classification of
widening/narrowing/behavioral/breaking changes and the re-validation
decision.  Pure driver-side; no Spark session."""

from validr_spark import T, modelclass
from validr_spark.schemadiff import (diff_verdict, needs_revalidation,
                                     schema_diff)


def v(old, new):
    return diff_verdict(schema_diff(old, new))


def test_identical():
    s = T.dict(x=T.int.min(0).max(9), t=T.str.maxlen(16))
    assert schema_diff(s, s) == []
    assert v(s, s) == "identical"
    assert not needs_revalidation(s, s)


def test_bound_direction():
    assert v(T.int.min(0), T.int.min(-5)) == "compatible"     # widened
    assert v(T.int.min(0), T.int.min(5)) == "narrowed"
    assert v(T.str.maxlen(10), T.str.maxlen(20)) == "compatible"
    assert v(T.str.maxlen(10), T.str.maxlen(5)) == "narrowed"
    d = schema_diff(T.int.min(0).max(9), T.int.min(1).max(20))
    sev = {e["path"]: e["severity"] for e in d}
    assert sev == {"min": "narrowing", "max": "widening"}


def test_optional_default_invalid_to():
    assert v(T.int, T.int.optional) == "compatible"
    assert v(T.int.optional, T.int) == "narrowed"
    assert v(T.int, T.int.default(3)) == "compatible"       # null now passes
    assert v(T.int.default(3), T.int.default(4)) == "outputs_changed"
    assert v(T.int, T.int.invalid_to(0)) == "compatible"
    assert v(T.int.invalid_to(0), T.int) == "narrowed"


def test_match_and_validator_change():
    assert v(T.str, T.str.match(r"[a-z]+")) == "narrowed"
    assert v(T.str.match(r"[a-z]+"), T.str) == "compatible"
    assert v(T.str.match(r"[a-z]+"), T.str.match(r"[0-9]+")) == "breaking"
    assert v(T.int, T.str) == "breaking"
    e = schema_diff(T.dict(x=T.int), T.dict(x=T.float))[0]
    assert e["path"] == "x" and e["kind"] == "validator_changed"


def test_dict_fields():
    old = T.dict(a=T.int, b=T.str)
    assert v(old, T.dict(a=T.int, b=T.str, c=T.int)) == "narrowed"
    # added OPTIONAL key: inputs still validate, but every output row
    # gains the (null/default-filled) field — output-shape change, the
    # mirror of field_removed below
    assert v(old, T.dict(a=T.int, b=T.str,
                         c=T.int.optional)) == "outputs_changed"
    # removed key: inputs still validate (extra keys dropped) but the
    # output loses the field
    assert v(old, T.dict(a=T.int)) == "outputs_changed"
    # nested path rendering
    d = schema_diff(T.dict(o=T.dict(x=T.int.min(0))),
                    T.dict(o=T.dict(x=T.int.min(1))))
    assert d[0]["path"] == "o.x.min" and d[0]["severity"] == "narrowing"


def test_list_enum_union():
    assert v(T.list(T.int.max(9)), T.list(T.int.max(5))) == "narrowed"
    d = schema_diff(T.list(T.int.max(9)), T.list(T.int.max(5)))
    assert d[0]["path"] == "[].max"
    assert v(T.enum("a b"), T.enum("a b c")) == "compatible"
    assert v(T.enum("a b c"), T.enum("a b")) == "narrowed"
    assert v(T.union([T.int]), T.union([T.int, T.list(T.int)])) \
        == "compatible"
    assert v(T.union([T.int, T.list(T.int)]), T.union([T.int])) \
        == "narrowed"
    # tagged union: tag removed → that shape no longer accepted
    old = T.union(a=T.dict(x=T.int), b=T.dict(y=T.str)).by("kind")
    new = T.union(a=T.dict(x=T.int)).by("kind")
    assert v(old, new) == "narrowed"


def test_behavioral_params_and_desc():
    assert v(T.str, T.str.strip) == "outputs_changed"
    assert v(T.str.desc("old"), T.str.desc("new")) == "compatible"
    d = schema_diff(T.str.desc("old"), T.str.desc("new"))
    assert d[0]["severity"] == "info"


def test_accepts_all_authoring_forms():
    @modelclass
    class M:
        x = T.int.min(0)

    assert v("int.min(0)", "int.min(-1)") == "compatible"
    assert v({"$self": "dict", "x": "int.min(0)"},
             {"$self": "dict", "x": "int.min(1)"}) == "narrowed"
    assert v(M, T.dict(x=T.int.min(0))) == "identical"


def test_cli_diff(tmp_path, capsys):
    import json

    from validr_spark.cli import main

    old = {"$self": "dict", "doc_id": "str.minlen(1)",
           "n_tok": "int.min(1)"}
    wide = {"$self": "dict", "doc_id": "str.minlen(1)",
            "n_tok": "int.min(0)"}
    narrow = {"$self": "dict", "doc_id": "str.minlen(2)",
              "n_tok": "int.min(1)"}
    paths = {}
    for name, obj in [("old", old), ("wide", wide), ("narrow", narrow)]:
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(obj))
        paths[name] = str(p)

    assert main(["diff", paths["old"], paths["wide"]]) == 0
    out = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert out[-1] == {"verdict": "compatible"}

    assert main(["diff", paths["old"], paths["narrow"]]) == 1
    out = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert out[-1] == {"verdict": "narrowed"}
    assert out[0]["path"] == "doc_id.minlen"


def test_bound_added_and_removed():
    assert v(T.int, T.int.min(0)) == "narrowed"
    assert v(T.int.min(0), T.int) == "compatible"
    assert v(T.str, T.str.maxlen(10)) == "narrowed"
    assert v(T.str.maxlen(10), T.str) == "compatible"
    d = schema_diff(T.int, T.int.min(0))
    assert d[0]["kind"] == "param_added" and d[0]["severity"] == "narrowing"
