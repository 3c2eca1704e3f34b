"""Structural dialog validation (operators/dialog.py)."""
import pytest
from pyspark.sql import functions as F

from validr_spark.operators.dialog import dialog_stats, dialog_violations

SCHEMA = ("doc_id string, source string, "
          "turns array<struct<role string, content string>>")


def _dialogs(spark):
    rows = [
        ("ok", "a", [("system", "be nice"), ("user", "hi"),
                     ("assistant", "hello")]),
        ("no_sys_ok", "a", [("user", "hi"), ("assistant", "hello")]),
        ("double_user", "a", [("user", "hi"), ("user", "again"),
                              ("assistant", "hello")]),
        ("late_system", "a", [("user", "hi"), ("system", "oops"),
                              ("assistant", "hello")]),
        ("bad_role", "b", [("user", "hi"), ("robot", "beep")]),
        ("empty_content", "b", [("user", ""), ("assistant", "hello")]),
        ("ends_user", "b", [("user", "hi"), ("assistant", "yo"),
                            ("user", "bye")]),
        ("empty_list", "b", []),
        ("null_list", "b", None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _v(spark):
    out = dialog_violations(_dialogs(spark)).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["rule_id"], r["position"]))
    return got


def test_clean_dialogs_have_no_violations(spark):
    got = _v(spark)
    assert "ok" not in got
    assert "no_sys_ok" not in got


def test_structural_rules_fire_with_positions(spark):
    got = _v(spark)
    assert ("turns.alternation", "turns[1].role") in got["double_user"]
    assert ("turns.system_position", "turns[1].role") in got["late_system"]
    assert ("turns[].role.enum", "turns[1].role") in got["bad_role"]
    # an unknown-role dialog ending on it also trips last_role
    assert ("turns.last_role", "turns") in got["bad_role"]
    assert ("turns[].content.required",
            "turns[0].content") in got["empty_content"]
    assert ("turns.last_role", "turns") in got["ends_user"]
    assert got["empty_list"] == [("turns.required", "turns")]
    assert got["null_list"] == [("turns.required", "turns")]


def test_collects_all_not_fail_fast(spark):
    df = _dialogs(spark).sparkSession.createDataFrame(
        [("multi", "a", [("robot", ""), ("robot", "")])], SCHEMA)
    rules = sorted(r["rule_id"] for r in dialog_violations(df).collect())
    # both turns trip role.enum AND content.required; turn 1 also trips
    # alternation (robot == robot) is skipped (non-listed role), and the
    # dialog trips last_role
    assert rules == ["turns.last_role", "turns[].content.required",
                     "turns[].content.required", "turns[].role.enum",
                     "turns[].role.enum"]


def test_option_switches(spark):
    df = _dialogs(spark)
    # no alternation requirement: double_user becomes clean
    v = dialog_violations(df, require_alternation=False).collect()
    assert not [r for r in v if r["doc_id"] == "double_user"]
    # no last-turn requirement: ends_user becomes clean
    v = dialog_violations(df, must_end_with=None).collect()
    assert not [r for r in v if r["doc_id"] == "ends_user"]
    # max_turns
    v = dialog_violations(df, max_turns=2).collect()
    assert [r["rule_id"] for r in v if r["doc_id"] == "ok"] \
        == ["turns.maxlen"]


def test_consecutive_system_turns_flag_position_not_alternation(spark):
    df = _dialogs(spark).sparkSession.createDataFrame(
        [("two_sys", "a", [("system", "x"), ("system", "y"),
                           ("user", "hi"), ("assistant", "ok")])], SCHEMA)
    got = [(r["rule_id"], r["position"])
           for r in dialog_violations(df).collect()]
    # the second system turn is a position violation; alternation is a
    # non-system rule so it must NOT also fire for the system pair
    assert got == [("turns.system_position", "turns[1].role")]


def test_dialog_stats_scorecard(spark):
    out = {r["source"]: r for r in dialog_stats(_dialogs(spark)).collect()}
    assert out["a"]["n_dialogs"] == 4
    assert out["a"]["n_bad_dialogs"] == 2          # double_user, late_system
    assert out["b"]["n_dialogs"] == 5
    assert out["b"]["n_bad_dialogs"] == 5
    assert out["b"]["max_turns"] == 3
    assert out["a"]["n_violations"] == 2
    assert out["b"]["n_violations"] >= 5


def test_plan_no_python_no_shuffle(spark):
    from validr_spark.testing import assert_no_python, assert_no_shuffle

    out = dialog_violations(_dialogs(spark))
    assert_no_python(out)
    assert_no_shuffle(out)


PREF_SCHEMA = ("doc_id string, source string, prompt string, "
               "chosen string, rejected string")


def _pairs(spark):
    rows = [
        ("ok", "a", "q1", "good long answer", "bad"),
        ("identical", "a", "q2", "same answer", "same answer"),
        ("case_only", "a", "q3", "An  Answer", "an answer"),
        ("no_prompt", "b", None, "x", "y"),
        ("empty_chosen", "b", "q5", "", "y"),
        ("null_rejected", "b", "q6", "x", None),
    ]
    return spark.createDataFrame(rows, PREF_SCHEMA)


def test_preference_violations(spark):
    from validr_spark.operators.dialog import preference_violations

    got = {}
    for r in preference_violations(_pairs(spark)).collect():
        got.setdefault(r["doc_id"], []).append(r["rule_id"])
    assert "ok" not in got
    assert got["identical"] == ["pair.identical"]
    assert got["case_only"] == ["pair.identical_normalized"]
    assert got["no_prompt"] == ["prompt.required"]
    assert got["empty_chosen"] == ["chosen.required"]
    assert got["null_rejected"] == ["rejected.required"]


def test_preference_stats_length_bias(spark):
    from validr_spark.operators.dialog import preference_stats

    out = {r["source"]: r for r in preference_stats(_pairs(spark)).collect()}
    a = out["a"]
    assert a["n_pairs"] == 3
    assert a["n_identical"] == 1
    assert a["n_identical_normalized"] == 1
    # length-unequal pairs in a: ok (16>3 chosen longer), case_only
    # (10 vs 9 chosen longer); identical pair excluded (equal lengths)
    assert a["chosen_longer_frac"] == 1.0
    b = out["b"]
    # b has no pair with both sides present -> NULL bias, 0 identical
    assert b["chosen_longer_frac"] is None
    assert b["n_identical"] == 0


def test_preference_plan_no_shuffle(spark):
    from validr_spark.operators.dialog import preference_violations
    from validr_spark.testing import assert_no_python, assert_no_shuffle

    out = preference_violations(_pairs(spark))
    assert_no_python(out)
    assert_no_shuffle(out)


def test_dialog_violations_streams_append_mode(spark, tmp_path):
    # the operator is two stateless projections unioned -> it runs
    # unchanged on a stream in append mode with exactly-once sinks
    df = _dialogs(spark)
    data = str(tmp_path / "dialogs")
    df.coalesce(1).write.parquet(data)
    sdf = spark.readStream.schema(df.schema).parquet(data)
    q = (dialog_violations(sdf).writeStream.format("memory")
         .queryName("dlg_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("dlg_stream").collect()
    batch = dialog_violations(df).collect()
    key = lambda r: (r["doc_id"], r["rule_id"], r["position"])
    assert sorted(map(key, got)) == sorted(map(key, batch))


def test_render_dialogs(spark):
    from validr_spark.operators.dialog import render_dialogs

    out = {r["doc_id"]: r for r in
           render_dialogs(_dialogs(spark)).collect()}
    assert out["ok"]["text"] == \
        "system: be nice\n\nuser: hi\n\nassistant: hello"
    assert out["ok"]["n_turns"] == 3
    assert out["empty_list"]["text"] == ""
    assert out["empty_list"]["n_turns"] == 0
    assert out["null_list"]["text"] == ""
    assert out["null_list"]["n_turns"] == 0
    # every input dialog yields exactly one output row; source carried
    assert len(out) == 9
    assert out["ok"]["source"] == "a"


def test_render_dialogs_null_fields_and_order(spark):
    from validr_spark.operators.dialog import render_dialogs

    df = spark.createDataFrame(
        [("x", "a", [(None, "hi"), ("assistant", None)])], SCHEMA)
    r = render_dialogs(df, turn_sep=" | ").collect()[0]
    assert r["text"] == ": hi | assistant: "
    # order survives the shuffle: a long dialog reassembles in turn order
    turns = [("user", f"m{i}") for i in range(40)]
    df2 = spark.createDataFrame([("y", "a", turns)], SCHEMA)
    r2 = render_dialogs(df2, role_sep="=", turn_sep=";").collect()[0]
    assert r2["text"] == ";".join(f"user=m{i}" for i in range(40))


def test_render_dialogs_plan_no_python_no_lambda(spark):
    from validr_spark.operators.dialog import render_dialogs
    from validr_spark.testing import assert_no_python, assert_plan

    out = render_dialogs(_dialogs(spark))
    assert_no_python(out)
    assert_plan(out, absent=["LambdaFunction"])


def test_dialog_stats_clean_group_reports_zero_not_null(spark):
    # a group with ZERO bad dialogs sums an all-NULL _nv column —
    # without the coalesce, n_bad_dialogs comes back NULL instead of 0
    rows = [
        ("c1", "clean", [("user", "hi"), ("assistant", "hello")]),
        ("c2", "clean", [("system", "s"), ("user", "q"),
                         ("assistant", "a")]),
        ("d1", "dirty", [("user", "hi"), ("user", "again"),
                         ("assistant", "x")]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["source"]: r for r in dialog_stats(df).collect()}
    assert out["clean"]["n_bad_dialogs"] == 0
    assert out["clean"]["n_violations"] == 0
    assert out["dirty"]["n_bad_dialogs"] == 1


def test_render_dialogs_duplicate_carried_rows_stay_distinct(spark):
    # two input rows with IDENTICAL carried columns must render as two
    # rows — grouping on carried values alone would interleave their
    # turns into one corrupted training text
    from validr_spark.operators.dialog import render_dialogs

    rows = [
        ("dup", "a", [("user", "first"), ("assistant", "one")]),
        ("dup", "a", [("user", "second"), ("assistant", "two")]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = render_dialogs(df).collect()
    assert len(out) == 2
    texts = sorted(r["text"] for r in out)
    assert texts == ["user: first\n\nassistant: one",
                     "user: second\n\nassistant: two"]
    assert all(r["n_turns"] == 2 for r in out)
