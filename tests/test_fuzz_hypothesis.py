"""Property-based fuzz: schema round-trips and scalar parity vs the
actual reference library (driver-side, no Spark session needed).

Complements the table-driven differential suite
(test_reference_differential.py): hypothesis explores the parameter
space (bounds, lengths, unicode payloads) the hand-written corpus
doesn't enumerate.
"""
import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from validr_spark.errors import Invalid
from validr_spark.pyvalidate import Compiler
from validr_spark.schema import Schema

from tests.test_reference_differential import refvalidr  # noqa: F401  (fixture)

SET = settings(max_examples=150, deadline=None,
               suppress_health_check=[HealthCheck.too_slow])

# --- strategies --------------------------------------------------------------

_scalars = st.sampled_from(
    ["int", "bool", "float", "str", "nstr", "date", "datetime", "ipv4",
     "uuid", "email", "url", "phone", "slug", "any", "time", "fqdn",
     "idcard"])


@st.composite
def _element(draw):
    v = draw(_scalars)
    parts = [v]
    if v == "int":
        if draw(st.booleans()):
            lo = draw(st.integers(-1000, 1000))
            hi = draw(st.integers(lo, lo + 2000))
            parts += [f"min({lo})", f"max({hi})"]
    elif v == "float":
        if draw(st.booleans()):
            lo = draw(st.integers(-100, 100))
            hi = lo + draw(st.integers(1, 200))
            parts += [draw(st.sampled_from([f"min({lo})", f"exmin({lo})"])),
                      draw(st.sampled_from([f"max({hi})", f"exmax({hi})"]))]
    elif v in ("str", "nstr"):
        if draw(st.booleans()):
            lo = draw(st.integers(0, 5))
            hi = draw(st.integers(max(lo, 1), 50))
            parts += [f"minlen({lo})", f"maxlen({hi})"]
        if draw(st.booleans()):
            parts.append("strip")
    if draw(st.booleans()):
        parts.append("optional")
    return ".".join(parts)


def _iso_schema(draw, depth=0):
    el = draw(_element())
    if depth >= 2 or draw(st.integers(0, 2)) == 0:
        return el
    kind = draw(st.sampled_from(["dict", "list"]))
    if kind == "list":
        return [f"list.maxlen({draw(st.integers(1, 99))})",
                _iso_schema(draw, depth + 1)]
    keys = draw(st.lists(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
        min_size=1, max_size=4, unique=True))
    return {"$self": "dict", **{k: _iso_schema(draw, depth + 1)
                                for k in keys}}


iso_schemas = st.composite(lambda draw: _iso_schema(draw))()

# --- schema round-trip -------------------------------------------------------


@SET
@given(iso_schemas)
def test_isomorph_roundtrip(iso):
    s1 = Schema.parse_isomorph_schema(iso)
    prim = s1.to_primitive()
    s2 = Schema.parse_isomorph_schema(prim)
    assert s2.to_primitive() == prim
    # repr is stable across the round-trip too
    assert s1.repr() == s2.repr()


@SET
@given(iso_schemas)
def test_roundtrip_matches_reference(refvalidr, iso):  # noqa: F811
    ours = Schema.parse_isomorph_schema(iso).to_primitive()
    theirs = refvalidr.Schema.parse_isomorph_schema(iso).to_primitive()
    assert ours == theirs

# --- scalar differential fuzz ------------------------------------------------

_values = st.one_of(
    st.none(),
    st.integers(-10**19, 10**19),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=40),
    st.text(alphabet=string.printable, max_size=60),
    st.booleans(),
    st.lists(st.integers(0, 5), max_size=3),
)


def _outcome(validate_factory, element, value, invalid_cls):
    try:
        validate = validate_factory(element)
    except Exception as ex:
        return ("schema_error", type(ex).__name__)
    try:
        return ("ok", validate(value))
    except invalid_cls as ex:
        return ("invalid", getattr(ex, "position", ""), ex.message)
    except Exception as ex:               # pragma: no cover - parity break
        return ("error", type(ex).__name__)


@SET
@given(st.tuples(_element(), _values))
def test_scalar_parity_fuzz(refvalidr, case):  # noqa: F811
    element, value = case
    ours = _outcome(
        lambda e: Compiler().compile(Schema.parse_element(e)),
        element, value, Invalid)
    theirs = _outcome(
        lambda e: refvalidr.Compiler().compile(
            refvalidr.Schema.parse_element(e)),
        element, value, refvalidr.Invalid)
    assert ours == theirs, (element, value)
