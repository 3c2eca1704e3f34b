"""Differential oracle vs the ACTUAL reference library (guyskk/validr).

The reference's Cython module has a build-time pure-Python translation
(`validr_uncython.py`); we run that translation into /tmp and import the
genuine reference package, then compare outcomes:

1. scalar corpus: our pyvalidate backend vs reference, same (value,
   schema) → same coerced output, or same (position, message).
2. the north-star per-row invariant: Spark-validated sequences vs the
   reference validator row-by-row — token-array equality on clean rows,
   first-violation (position, message) equality on bad rows (the reference
   dict validator is fail-fast in field order, `_validator_c.pyx:580-582`;
   our violations array preserves schema-field order, so element 0 must
   match).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REF = "/root/reference"
REF_COPY = "/tmp/refvalidr_diff"


@pytest.fixture(scope="session")
def refvalidr():
    if not os.path.isdir(os.path.join(REF, "src", "validr")):
        pytest.skip("reference repo not available")
    if not os.path.exists(os.path.join(REF_COPY, "validr", "_validator_py.py")):
        shutil.rmtree(REF_COPY, ignore_errors=True)
        os.makedirs(REF_COPY, exist_ok=True)
        shutil.copytree(os.path.join(REF, "src", "validr"),
                        os.path.join(REF_COPY, "validr"))
        subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from validr_uncython import compile_pyx_to_py; "
             "compile_pyx_to_py([%r])"
             % (REF, os.path.join(REF_COPY, "validr", "_validator_c.pyx"))],
            check=True)
    sys.path.insert(0, REF_COPY)
    import validr as ref

    yield ref
    sys.path.remove(REF_COPY)


# --- part 1: scalar corpus --------------------------------------------------

ELEMENTS = [
    "int", "int.min(0).max(9)", "int.optional", "int.default(5)",
    "float.min(0).exmax(1)", "float.optional",
    "bool", "bool.optional",
    "str", "str.minlen(2).maxlen(4)", "str.strip", "str.escape",
    "str.match('[a-z]+')", "str.optional", "str.default('d')",
    "nstr.optional",
    "enum('A B C')",
    "date", "date.format('%Y/%m/%d')",
    "time", "datetime",
    "timedelta", "timedelta.min('1s').max('1d')", "timedelta.string",
    "ipv4", "ipv6", "email", "url", "url.scheme('http')",
    "fqdn", "uuid", "phone", "idcard", "slug",
]

VALUES = [
    None, "", 0, 1, 9, 10, -1, "5", "abc", "ABC", " ab ", "a" * 10,
    3.5, "3.5", "INF", "nan", True, False, "yes", "off", "x",
    "2016-07-09", "2016-7-9", "2016-13-09", "12:00:59", "24:00:00",
    "2016-07-09T00:00:00.123Z", "2016-07-09T00:00:00.123456Z",
    "10s", "12h59s", "2d59m59s", "10x", 60, 1.5,
    "127.0.0.1", "256.0.0.0", "::1", "2001:db8:2de::e13", "2001::25de::cade",
    "12345678@qq.com", " 123@163.com ", "123 @163.com",
    "https://github.com", "github.com", "http://x.com/" + "y" * 250,
    "mx.gmail.com.", "a..bc",
    "5e84b2f6-6b6b-4f3c-a24d-6d2e2faab8b3",
    "5E84B2F66B6B4F3CA24D6D2E2FAAB8B3", "xxxxxxxx-xxxx",
    "13387654321", "+8613387654321", "aa-b-c", "-a", "A",
    [1, 2], {"k": 1},
]


def _outcome(compilerf, element, value, invalid_cls):
    try:
        validate = compilerf(element)
    except Exception as ex:       # SchemaError parity is tested elsewhere
        return ("schema_error", type(ex).__name__)
    try:
        return ("ok", validate(value))
    except invalid_cls as ex:
        return ("invalid", ex.position, ex.message)
    except Exception as ex:
        # both engines may raise the same non-Invalid error on absurd input
        # (e.g. unhashable value into bool) — parity still required
        return ("error", type(ex).__name__)


def _norm_nan(o):
    import math

    if o[0] == "ok" and isinstance(o[1], float) and math.isnan(o[1]):
        return ("ok", "NaN")
    return o


def test_scalar_corpus_matches_reference(refvalidr):
    from validr_spark import Invalid as OurInvalid
    from validr_spark import T as OurT
    from validr_spark.pyvalidate import Compiler as OurCompiler

    RefInvalid = refvalidr.Invalid
    mism = []
    for el in ELEMENTS:
        ours_c = lambda e: OurCompiler().compile(OurT(e))  # noqa: E731
        ref_c = lambda e: refvalidr.Compiler().compile(refvalidr.T(e))  # noqa: E731
        for v in VALUES:
            a = _norm_nan(_outcome(ours_c, el, v, OurInvalid))
            b = _norm_nan(_outcome(ref_c, el, v, RefInvalid))
            if a != b:
                mism.append((el, repr(v), a, b))
    assert not mism, "first 15 of %d: %s" % (
        len(mism), json.dumps(mism[:15], default=str, indent=2))


# --- part 2: the north-star per-row invariant over Spark --------------------

def test_sequences_rows_match_reference(refvalidr, spark):
    from pyspark.sql import functions as F

    from validr_spark.compiler import SparkCompiler
    from validr_spark.datagen import make_sequences, sequences_schema

    n = 3000
    seq = make_sequences(spark, n, maxlen=64).withColumn(
        "_rid", F.monotonically_increasing_id())
    schema = sequences_schema()
    res = SparkCompiler().compile(schema).apply(seq, id_cols=["_rid"])
    got = {r["_rid"]: r for r in res.df.collect()}
    raw = {r["_rid"]: r for r in seq.collect()}
    assert len(got) == n

    ref_validate = refvalidr.Compiler().compile(
        refvalidr.T(schema.__schema__.to_primitive()))

    n_bad = 0
    for rid, row in raw.items():
        value = {"doc_id": row["doc_id"], "tokens": row["tokens"],
                 "n_tok": row["n_tok"], "source": row["source"]}
        ours = got[rid]
        try:
            expect = ref_validate(dict(value))
        except refvalidr.Invalid as ex:
            n_bad += 1
            viols = ours["_violations"]
            assert viols, f"rid={rid}: reference invalid ({ex}) but no violations"
            first = viols[0]
            assert first["position"] == ex.position, \
                f"rid={rid}: {first['position']} != {ex.position}"
            assert first["message"] == ex.message, \
                f"rid={rid}: {first['message']!r} != {ex.message!r}"
            continue
        # clean row: full coerced-output equality, incl. token arrays
        assert not ours["_violations"], \
            f"rid={rid}: ours flagged {ours['_violations']}, ref passed"
        assert list(ours["tokens"]) == list(expect["tokens"])
        assert ours["doc_id"] == expect["doc_id"]
        assert ours["n_tok"] == expect["n_tok"]
        assert ours["source"] == expect["source"]
    assert n_bad > 0     # injection really produced reference-visible errors
