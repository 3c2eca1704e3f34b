"""Regression tests for the round-3 continuation review of the tooling
layer: schemadiff model/list/map handling, field-added-with-default
classification, and the bench steady-state protocol inversion."""

import json

import pytest

from validr_spark import T, modelclass
from validr_spark.schemadiff import (diff_verdict, needs_revalidation,
                                     schema_diff)


# ------------------------------------------------------------- schemadiff

def test_schema_diff_model_nodes():
    @modelclass
    class M:
        x = T.int.min(0)
        y = T.str

    assert schema_diff(T.dict(m=T.model(M)), T.dict(m=T.model(M))) == []

    @modelclass
    class M2:
        x = T.int.min(5)          # tightened
        y = T.str

    d = schema_diff(T.dict(m=T.model(M)), T.dict(m=T.model(M2)))
    assert len(d) == 1
    assert d[0]["path"] == "m.x.min" and d[0]["severity"] == "narrowing"


def test_schema_diff_list_items_added_removed():
    d = schema_diff("list", ["list", "int.min(0)"])
    assert len(d) == 1 and d[0]["kind"] == "items_added"
    assert d[0]["severity"] == "narrowing"
    assert needs_revalidation("list", ["list", "int.min(0)"])

    d2 = schema_diff(["list", "int.min(0)"], "list")
    assert len(d2) == 1 and d2[0]["kind"] == "items_removed"
    assert d2[0]["severity"] == "widening"
    assert not needs_revalidation(["list", "int.min(0)"], "list")


def test_schema_diff_map_value_schema_recurses_and_serializes():
    old = T.dict(props=T.dict.key(T.str.minlen(1)).value(T.str.maxlen(4)))
    wid = T.dict(props=T.dict.key(T.str.minlen(1)).value(T.str.maxlen(8)))
    d = schema_diff(old, wid)
    json.dumps(d)                      # raw Schema objects would crash
    assert len(d) == 1
    assert d[0]["path"] == "props.$self_value.maxlen"
    assert d[0]["severity"] == "widening"
    assert diff_verdict(d) == "compatible"
    # the reverse direction narrows
    d2 = schema_diff(wid, old)
    assert d2[0]["severity"] == "narrowing"
    assert needs_revalidation(wid, old)


def test_schema_diff_field_added_with_default_is_behavioral():
    old = T.dict(a=T.int)
    new = T.dict(a=T.int, b=T.int.default(5))
    d = schema_diff(old, new)
    assert len(d) == 1 and d[0]["kind"] == "field_added"
    # outputs gain column b on every row → re-run required
    assert d[0]["severity"] == "behavioral"
    assert diff_verdict(d) == "outputs_changed"
    assert needs_revalidation(old, new)
    # a REQUIRED added field still narrows
    d2 = schema_diff(old, T.dict(a=T.int, b=T.int))
    assert d2[0]["severity"] == "narrowing"


# ---------------------------------------------------- bench steady window

def _mock_steady(monkeypatch, seq):
    import bench

    it = iter(seq)

    def fake(_spark):
        t = next(it)
        return {"seconds": t, "rows": 100, "tokens": 1000,
                "sequences_per_sec": 100 / t, "tokens_per_sec": 1000 / t}

    monkeypatch.setattr(bench, "bench_sequences", fake)
    return bench


def test_bench_steady_stops_in_quiet_window(monkeypatch):
    bench = _mock_steady(monkeypatch, [124.0, 3.3, 3.4, 3.2, 99.0, 99.0])
    out = bench.bench_sequences_steady(None, measured=3, max_runs=6)
    # warmup run is excluded by the >10%-improvement reset; the three
    # quiet runs end the loop BEFORE the trailing contended values
    assert out["all_seconds"] == [124.0, 3.3, 3.4, 3.2]
    assert out["seconds"] == 3.3            # median of the quiet window
    assert out["best_seconds"] == 3.2


def test_bench_steady_does_not_publish_contended_window(monkeypatch):
    # fluke best then contention: the OLD (inverted) protocol stopped
    # after three >=10%-worse runs and published median 410 as steady
    bench = _mock_steady(monkeypatch,
                         [36.0, 400.0, 410.0, 420.0, 37.0, 38.0, 36.5])
    out = bench.bench_sequences_steady(None, measured=3, max_runs=7)
    assert len(out["all_seconds"]) == 7     # did NOT early-exit on noise
    assert out["seconds"] == 37.0           # median of the final quiet runs
    assert out["best_seconds"] == 36.0
