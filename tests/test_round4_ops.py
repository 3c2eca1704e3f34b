"""Round-4 operator families: SFT loss-mask spans, batch-shape padding
planner, boilerplate template mining."""
import pytest
from pyspark.sql import functions as F

DIALOG_SCHEMA = ("doc_id string, "
                 "turns array<struct<role string, content string>>")


# ---------------------------------------------------------------- loss_spans
def _dlg(spark):
    rows = [
        ("a", [("system", "be nice"), ("user", "hi"),
               ("assistant", "hello!")]),
        ("b", []),
        ("c", None),
        ("d", [(None, "x"), ("assistant", None)]),
        ("e", [("user", "q"), ("assistant", "ans")]),
        # NULL turn STRUCT: the renderer's concat_ws drops the NULL line
        # and its separator — spans must number/offset the RENDERED turns
        ("f", [("user", "q1"), None, ("assistant", "a1")]),
    ]
    return spark.createDataFrame(rows, DIALOG_SCHEMA)


def test_loss_spans_substring_invariant(spark):
    """[start_char, end_char) must cut exactly the coalesced content out
    of the render_dialogs text with the same separators."""
    from validr_spark.operators.dialog import loss_spans, render_dialogs

    d = _dlg(spark)
    j = (loss_spans(d)
         .join(render_dialogs(d).select("doc_id", "text"), "doc_id")
         .select("doc_id", "turn_idx",
                 F.expr("substring(text, start_char + 1, "
                        "end_char - start_char)").alias("cut"),
                 "role", "learn"))
    rows = {(r["doc_id"], r["turn_idx"]): r for r in j.collect()}
    assert rows[("a", 0)]["cut"] == "be nice"
    assert rows[("a", 1)]["cut"] == "hi"
    assert rows[("a", 2)]["cut"] == "hello!"
    assert rows[("a", 2)]["learn"] is True
    assert rows[("a", 0)]["learn"] is False
    # NULL role/content behave exactly like the renderer ('')
    assert rows[("d", 0)]["cut"] == "x"
    assert rows[("d", 1)]["cut"] == ""
    assert rows[("d", 1)]["learn"] is True
    # empty/NULL dialogs contribute no rows
    assert not any(k[0] in ("b", "c") for k in rows)
    # a NULL turn struct vanishes from the render (no line, no
    # separator); spans follow the rendered numbering
    assert rows[("f", 0)]["cut"] == "q1"
    assert rows[("f", 1)]["cut"] == "a1"
    assert rows[("f", 1)]["role"] == "assistant"
    assert ("f", 2) not in rows


def test_loss_spans_custom_separators_and_roles(spark):
    from validr_spark.operators.dialog import loss_spans

    d = spark.createDataFrame(
        [("x", [("u", "aa"), ("m", "bbb")])], DIALOG_SCHEMA)
    out = {r["turn_idx"]: r for r in
           loss_spans(d, role_sep="=", turn_sep=";;;",
                      learn_roles=("m", "u")).collect()}
    # "u=aa;;;m=bbb": content 'aa' at [2,4), 'bbb' at [9,12)
    assert (out[0]["start_char"], out[0]["end_char"]) == (2, 4)
    assert (out[1]["start_char"], out[1]["end_char"]) == (9, 12)
    assert out[0]["learn"] and out[1]["learn"]


def test_loss_spans_plan_no_python(spark):
    # the one lambda (the null-turn ArrayFilter, bounded per dialog row)
    # is deliberate — see the operator docstring; the hot path (prefix
    # sums, spans) stays lambda-free codegen
    from validr_spark.operators.dialog import loss_spans
    from validr_spark.testing import assert_no_python

    out = loss_spans(_dlg(spark))
    assert_no_python(out)


# ------------------------------------------------------------ length_buckets
def test_length_buckets_equal_counts_and_waste(spark):
    from validr_spark.operators.packing import length_buckets

    df = spark.range(1000).select((F.col("id") % 100 + 1).alias("n_tok"))
    out = length_buckets(df, num_buckets=4).collect()
    assert [r["bucket"] for r in out] == [0, 1, 2, 3]
    assert all(r["n_seqs"] == 250 for r in out)
    b0 = out[0]
    assert (b0["min_len"], b0["max_len"]) == (1, 25)
    assert b0["total_tokens"] == 250 * 13  # sum 1..25 is 325 -> *10 = 3250
    assert b0["padded_tokens"] == 250 * 25
    assert b0["waste_ppm"] == (b0["padded_tokens"] - b0["total_tokens"]) \
        * 1_000_000 // b0["padded_tokens"]


def test_length_buckets_single_length_spike_stays_whole(spark):
    """A dominant single length is never split across buckets."""
    from validr_spark.operators.packing import length_buckets

    df = spark.createDataFrame(
        [(10,)] * 90 + [(50,)] * 5 + [(99,)] * 5, "n_tok int")
    out = length_buckets(df, num_buckets=4).collect()
    ten = [r for r in out if r["min_len"] <= 10 <= r["max_len"]]
    assert len(ten) == 1 and ten[0]["n_seqs"] >= 90
    # zero waste inside a single-length bucket
    assert ten[0]["waste_ppm"] == 0


def test_length_buckets_all_zero_lengths_no_ansi_abort(spark):
    """padded_tokens = 0 for an all-zero-length bucket: must report
    waste_ppm 0, not raise DIVIDE_BY_ZERO under ANSI."""
    from validr_spark.operators.packing import length_buckets

    df = spark.createDataFrame([(0,), (0,), (0,)], "n_tok int")
    out = length_buckets(df, num_buckets=2).collect()
    assert len(out) == 1
    assert out[0]["padded_tokens"] == 0
    assert out[0]["waste_ppm"] == 0


def test_length_buckets_null_lengths_excluded(spark):
    from validr_spark.operators.packing import length_buckets

    df = spark.createDataFrame([(5,), (None,), (7,)], "n_tok int")
    out = length_buckets(df, num_buckets=2).collect()
    assert sum(r["n_seqs"] for r in out) == 2


def test_length_buckets_no_python(spark):
    from validr_spark.operators.packing import length_buckets
    from validr_spark.testing import assert_no_python

    df = spark.range(100).select((F.col("id") % 7).alias("n_tok"))
    assert_no_python(length_buckets(df))


# ----------------------------------------------------------- template_mining
def test_template_mining_groups_digit_variants(spark):
    from validr_spark.operators.textstats import template_mining

    rows = [("Page 1 of 10",), ("page 2 of  10",), ("Page 33 of 99",),
            ("Error 404",), ("Error 500",), ("one-off text",)]
    out = template_mining(spark.createDataFrame(rows, "text string"),
                          min_docs=2).collect()
    got = {r["template"]: r for r in out}
    assert got["page # of #"]["n_docs"] == 3
    assert got["error #"]["n_docs"] == 2
    # example is the lexicographic min of the RAW variants
    assert got["error #"]["example"] == "Error 404"
    assert "one-off text" not in got


def test_template_mining_min_docs_and_top(spark):
    from validr_spark.operators.textstats import template_mining

    rows = [("a 1",)] * 5 + [("b 2",)] * 3 + [("c 3",)] * 2
    df = spark.createDataFrame(rows, "text string")
    out = template_mining(df, min_docs=3, top=1).collect()
    assert len(out) == 1
    assert out[0]["template"] == "a #" and out[0]["n_docs"] == 5


def test_template_mining_no_python(spark):
    from validr_spark.operators.textstats import template_mining
    from validr_spark.testing import assert_no_python

    df = spark.createDataFrame([("x 1",)], "text string")
    assert_no_python(template_mining(df))


# --------------------------------------------------------------- turn_stats
def test_turn_stats_per_role_scorecard(spark):
    from validr_spark.operators.dialog import turn_stats

    rows = [
        ("s1", [("user", "hi"), ("assistant", "hello!")]),
        ("s1", [("user", ""), ("assistant", None), (None, "x")]),
        ("s1", None),
        ("s2", [("user", "abcd")]),
    ]
    df = spark.createDataFrame(
        rows, "source string, "
              "turns array<struct<role string, content string>>")
    out = {(r["source"], r["role"]): r
           for r in turn_stats(df).collect()}
    u1 = out[("s1", "user")]
    assert u1["n_turns"] == 2
    assert u1["avg_content_chars"] == 1.0      # 'hi' (2) + '' (0)
    assert u1["n_empty"] == 1
    a1 = out[("s1", "assistant")]
    assert a1["n_turns"] == 2
    assert a1["max_content_chars"] == 6
    assert a1["n_empty"] == 1                  # the NULL content
    # NULL role surfaces under the out-of-band '<null>' sentinel (not a
    # dropped row, and not merged with a genuine role named "null")
    assert out[("s1", "<null>")]["n_turns"] == 1
    assert out[("s2", "user")]["avg_content_chars"] == 4.0


def test_turn_stats_no_python(spark):
    from validr_spark.operators.dialog import turn_stats
    from validr_spark.testing import assert_no_python

    df = spark.createDataFrame(
        [("s", [("user", "x")])],
        "source string, turns array<struct<role string, content string>>")
    assert_no_python(turn_stats(df))


# --------------------------------------------------------- context_overflow
def test_context_overflow_counts_and_ppm(spark):
    from validr_spark.operators.packing import context_overflow

    df = spark.createDataFrame(
        [(100,), (200,), (300,), (None,)], "n_tok int")
    out = {r["cutoff"]: r for r in
           context_overflow(df, cutoffs=(128, 256)).collect()}
    assert set(out) == {128, 256}
    r = out[128]
    assert (r["n_seqs"], r["n_over"]) == (3, 2)
    assert r["tokens_total"] == 600
    assert r["tokens_lost"] == (200 - 128) + (300 - 128)
    assert r["over_ppm"] == 2 * 1_000_000 // 3
    assert r["lost_ppm"] == r["tokens_lost"] * 1_000_000 // 600
    r = out[256]
    assert (r["n_over"], r["tokens_lost"]) == (1, 44)


def test_context_overflow_grouped_single_pass(spark):
    from validr_spark.operators.packing import context_overflow
    from validr_spark.testing import assert_no_python, count_exchanges

    df = spark.createDataFrame(
        [("a", 10), ("a", 50), ("b", 100)], "src string, n_tok int")
    out = context_overflow(df, cutoffs=(32, 64), len_col="n_tok",
                           group_col="src")
    # plan shape BEFORE execution: one aggregation pass = a single
    # shuffle, cutoffs exploded after (post-collect the AQE final plan
    # string prints the same exchange twice)
    assert_no_python(out)
    assert count_exchanges(out) == 1
    rows = {(r["src"], r["cutoff"]): r for r in out.collect()}
    assert rows[("a", 32)]["n_over"] == 1
    assert rows[("b", 64)]["tokens_lost"] == 36


def test_context_overflow_rejects_bad_cutoffs(spark):
    import pytest as _pytest

    from validr_spark.operators.packing import context_overflow

    df = spark.createDataFrame([(1,)], "n_tok int")
    with _pytest.raises(ValueError):
        context_overflow(df, cutoffs=())
    with _pytest.raises(ValueError):
        context_overflow(df, cutoffs=(0, 64))
