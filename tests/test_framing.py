"""frame_violations — token-frame integrity (BOS/EOS/trailing-pad).

Verified against an independent pure-Python reference implementation
over a hand-built case table plus the same property on random arrays.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from validr_spark.operators.sequences import frame_violations

BOS, EOS, PAD = 1, 2, 0


def ref_frame_violations(tokens, bos=BOS, eos=EOS, pad=PAD):
    """Independent reference: list-based, no string rendering."""
    if tokens is None:
        return set()
    visible = [t for t in tokens if t is not None]   # concat_ws skips nulls
    content = list(visible)
    if pad is not None:
        while content and content[-1] == pad:
            content.pop()
    out = set()
    has = bool(content)
    if not has:
        out.add("tokens.content")
    if bos is not None and has and (tokens[0] is None or tokens[0] != bos):
        out.add("tokens.bos")
    if eos is not None and has and content[-1] != eos:
        out.add("tokens.eos")
    if pad is not None and any(t == pad for t in content):
        out.add("tokens.pad")
    return out


CASES = [
    ("ok_plain", [BOS, 11, 12, EOS]),
    ("ok_padded", [BOS, 11, EOS, PAD, PAD]),
    ("no_bos", [11, 12, EOS]),
    ("no_eos", [BOS, 11, 12]),
    ("interior_pad", [BOS, 11, PAD, 12, EOS]),
    ("interior_pad_no_eos", [BOS, PAD, 11]),
    ("empty", []),
    ("all_pad", [PAD, PAD, PAD]),
    ("only_bos", [BOS]),
    ("only_eos", [EOS]),
    ("bos_eos_only", [BOS, EOS]),
    ("pad_then_all", [PAD, BOS, 11, EOS]),
    ("multidigit_no_false_pad", [BOS, 10, 100, EOS]),  # '0' inside ids
    ("null_elem", [BOS, None, 11, EOS]),
    ("null_first", [None, 11, EOS]),
    ("null_array", None),
    # zero rendered tokens: comma string is ",," — must count as 0
    # visible tokens (tokens.content), not 1 (spurious bos/eos)
    ("all_null", [None, None]),
    ("single_null", [None]),
    ("null_then_pad", [None, PAD]),
]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = frame_violations(df, **kw).collect()
    by = {}
    for r in got:
        by.setdefault(r["doc_id"], set()).add(r["rule_id"])
    return by, got


def test_case_table_matches_reference(spark):
    by, _ = _run(spark, CASES, bos=BOS, eos=EOS, pad=PAD)
    for name, toks in CASES:
        assert by.get(name, set()) == ref_frame_violations(toks), name


def test_random_arrays_match_reference(spark):
    rng = random.Random(42)
    rows = []
    for i in range(300):
        n = rng.randint(0, 8)
        toks = [rng.choice([BOS, EOS, PAD, 10, 11, 100, 207])
                for _ in range(n)]
        rows.append((f"r{i}", toks))
    by, _ = _run(spark, rows, bos=BOS, eos=EOS, pad=PAD)
    for doc, toks in rows:
        assert by.get(doc, set()) == ref_frame_violations(toks), (doc, toks)


def test_positions_and_messages(spark):
    rows = [("a", [11, 12, 13]),                    # bad bos + bad eos
            ("b", [BOS, 11, EOS, PAD, PAD])]        # clean
    _, got = _run(spark, rows, bos=BOS, eos=EOS, pad=PAD)
    v = {(r["doc_id"], r["rule_id"]): r for r in got}
    assert v[("a", "tokens.bos")]["position"] == "tokens[0]"
    assert v[("a", "tokens.bos")]["message"] == f"first token must be {BOS}"
    assert v[("a", "tokens.bos")]["value"] == "11"
    assert v[("a", "tokens.eos")]["position"] == "tokens[2]"
    assert v[("a", "tokens.eos")]["value"] == "13"
    assert ("b", "tokens.eos") not in v


def test_eos_position_accounts_for_trailing_pads(spark):
    _, got = _run(spark, [("x", [BOS, 11, 13, PAD, PAD, PAD])],
                  bos=BOS, eos=EOS, pad=PAD)
    (r,) = [g for g in got if g["rule_id"] == "tokens.eos"]
    assert r["position"] == "tokens[2]"     # last non-pad index
    assert r["value"] == "13"


def test_checks_are_optional(spark):
    rows = [("a", [11, PAD, 12])]
    by, got = _run(spark, rows, pad=PAD)            # no bos/eos configured
    assert by["a"] == {"tokens.pad"}
    by2, _ = _run(spark, rows)                      # nothing configured
    assert "a" not in by2                           # only content check ran


def test_plan_is_single_projection(spark):
    df = spark.createDataFrame([("a", [1, 2])],
                               "doc_id string, tokens array<int>")
    plan = (frame_violations(df, bos=BOS, eos=EOS, pad=PAD)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan                   # pure map-side
    assert "BatchEvalPython" not in plan            # no Python UDF


def test_eos_position_with_null_elements_uses_rendered_index(spark):
    """A null element before the tail must not shift the reported eos
    position: positions index the null-skipped rendering."""
    _, got = _run(spark, [("x", [BOS, None, 13, PAD])],
                  bos=BOS, eos=EOS, pad=PAD)
    (r,) = [g for g in got if g["rule_id"] == "tokens.eos"]
    # rendered tokens are [1, 13, 0]; last non-pad (13) is index 1
    assert r["position"] == "tokens[1]"
    assert r["value"] == "13"


def test_random_arrays_multidigit_and_negative_pad(spark):
    """The trailing-run width arithmetic must hold for any pad rendering
    (multi-digit, negative) — same reference differential, other pads."""
    rng = random.Random(99)
    for bos, eos, pad in ((1, 2, 10), (5, 6, 207), (1, 2, -7)):
        rows = []
        for i in range(120):
            n = rng.randint(0, 7)
            toks = [rng.choice([bos, eos, pad, 100, 107, 20])
                    for _ in range(n)]
            rows.append((f"r{i}", toks))
        by, _ = _run(spark, rows, bos=bos, eos=eos, pad=pad)
        for doc, toks in rows:
            assert by.get(doc, set()) == \
                ref_frame_violations(toks, bos, eos, pad), (pad, doc, toks)
