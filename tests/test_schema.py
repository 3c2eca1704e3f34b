"""Schema algebra: builder, element strings, isomorph JSON, round trips
(reference tests/test_schema.py, test_element.py, test_isomorph_schema.py)."""

import pytest

from validr_spark import Schema, SchemaError, T


def test_builder_basic():
    s = T.int.min(0).max(9).__schema__
    assert s.validator == "int"
    assert s.params == {"min": 0, "max": 9}
    assert s.repr() == "T.int.min(0).max(9)"


def test_builder_flag_params():
    s = T.str.optional.__schema__
    assert s.params == {"optional": True}
    assert T.str.strip.escape.__schema__.params == {
        "strip": True, "escape": True}


def test_builder_dict_items():
    s = T.dict(a=T.int, b=T.str).__schema__
    assert set(s.items) == {"a", "b"}
    assert s.items["a"].validator == "int"


def test_builder_list_items():
    s = T.list(T.int.min(0)).minlen(1).__schema__
    assert s.items.validator == "int"
    assert s.params == {"minlen": 1}


def test_enum_items_string_form():
    s = T.enum("A B C").__schema__
    assert s.items == ["A", "B", "C"]
    s2 = T.enum("A, B, C").__schema__
    assert s2.items == ["A", "B", "C"]


def test_slice():
    s = T.dict(a=T.int, b=T.str, c=T.bool)
    sub = s["a", "c"].__schema__
    assert set(sub.items) == {"a", "c"}
    with pytest.raises(ValueError):
        s["missing"]
    with pytest.raises(ValueError):
        T.int["a"]


def test_parse_element():
    s = Schema.parse_element("int.min(0).max(9)")
    assert s == T.int.min(0).max(9)
    s = Schema.parse_element("str.minlen(1).optional")
    assert s.params == {"minlen": 1, "optional": True}
    s = Schema.parse_element('str.match("[a-z]+")')
    assert s.params == {"match": "[a-z]+"}
    s = Schema.parse_element("float.min(-1.5).max(2e3)")
    assert s.params == {"min": -1.5, "max": 2000.0}
    s = Schema.parse_element("enum.optional")
    assert s.validator == "enum"


@pytest.mark.parametrize("bad", ["", None, "int.min(", "int.min(0",
                                 "3x", "int..min"])
def test_parse_element_errors(bad):
    with pytest.raises(SchemaError):
        Schema.parse_element(bad)


def test_isomorph_round_trip():
    schema = T.dict(
        user=T.dict(userid=T.int.min(0).max(9)),
        tags=T.list(T.int.min(0)),
        style=T.dict(width=T.int, color=T.str.optional),
        optional=T.str.optional,
    ).__schema__
    prim = schema.to_primitive()
    back = Schema.parse_isomorph_schema(prim)
    assert back == schema


def test_isomorph_forms():
    s = Schema.parse_isomorph_schema(
        {"$self": "dict.optional", "key": ["int.min(0)"]})
    assert s.validator == "dict"
    assert s.params == {"optional": True}
    assert s.items["key"].validator == "list"
    assert s.items["key"].items.validator == "int"

    s = Schema.parse_isomorph_schema(["list.unique", "int"])
    assert s.params == {"unique": True}

    s = Schema.parse_isomorph_schema(["enum", "A", "B"])
    assert s.items == ["A", "B"]

    with pytest.raises(SchemaError):
        Schema.parse_isomorph_schema([])
    with pytest.raises(SchemaError):
        Schema.parse_isomorph_schema(["list", "int", "int"])
    with pytest.raises(SchemaError):
        Schema.parse_isomorph_schema(123)


def test_isomorph_error_position():
    with pytest.raises(SchemaError) as ei:
        Schema.parse_isomorph_schema({"key": {"inner": "!!bad!!"}})
    assert ei.value.position == "key.inner"


def test_repr_ordering():
    s = T.str.optional.minlen(1).desc("d").default("x").__schema__
    # values first, then default, optional, desc last
    assert s.repr() == "T.str.minlen(1).default('x').optional.desc('d')"
    assert s.repr(desc=False) == "T.str.minlen(1).default('x').optional"


def test_T_load():
    s = T.dict(a=T.int).__schema__
    assert T(s).__schema__ == s
    assert T("int.min(0)").__schema__ == T.int.min(0).__schema__
    assert T({"a": "int"}).__schema__.items["a"].validator == "int"


def test_copy_independent():
    s = T.dict(a=T.int).__schema__
    c = s.copy()
    c.items["a"].params["min"] = 5
    assert "min" not in s.items["a"].params


def test_hash_eq():
    assert T.int.min(0) == T.int.min(0)
    assert hash(T.int.min(0).__schema__) == hash(T.int.min(0).__schema__)
    assert T.int.min(0) != T.int.min(1)
