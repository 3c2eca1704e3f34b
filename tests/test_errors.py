"""Error/mark/position contract (reference tests/test_exception.py)."""

import pytest

from validr_spark import Invalid, SchemaError, T, mark_index, mark_key


def test_message():
    assert Invalid("invalid").message == "invalid"
    assert Invalid().message is None


@pytest.mark.parametrize("build,expected", [
    (lambda e: e.mark_key("key"), "key"),
    (lambda e: e.mark_index(0), "[0]"),
    (lambda e: e.mark_index(), "[]"),
    (lambda e: e.mark_key("key").mark_index(0).mark_index(), "[][0].key"),
    (lambda e: e.mark_index().mark_index(0).mark_key("key"), "key[0][]"),
])
def test_position(build, expected):
    assert build(Invalid("invalid")).position == expected


def test_field():
    assert Invalid("x").mark_key("key").field == "key"
    assert Invalid("x").mark_key("key").mark_index(0).field == 0
    assert Invalid("x").mark_index(0).mark_key("key").field == "key"


def test_str():
    assert str(Invalid("invalid").mark_index(0).mark_key("key")) == \
        "key[0]: invalid"
    assert str(Invalid().mark_index(0).mark_key("key")) == "key[0]: invalid"
    assert str(Invalid("invalid")) == "invalid"
    assert str(Invalid()) == "invalid"
    assert str(Invalid("invalid", value=123)) == "invalid, value=123"
    assert str(SchemaError("invalid", value=T.str.__schema__)) == \
        "invalid, schema=str"
    assert len(str(Invalid(value="x" * 1000))) < 100


def test_context_managers():
    with pytest.raises(Invalid) as ei:
        with mark_index():
            with mark_index(0):
                with mark_key("key"):
                    raise Invalid("invalid")
    assert ei.value.position == "[][0].key"

    with pytest.raises(Invalid) as ei:
        with mark_key("key"):
            with mark_index(0):
                with mark_index():
                    raise Invalid("invalid")
    assert ei.value.position == "key[0][]"
