"""CLI suggest/check subcommands: draft a schema from a table, gate a
table with a JSON check-suite spec (exit 1 on failure)."""
import json

import pytest


@pytest.fixture()
def table(spark, tmp_path):
    rows = [(f"d{i:03d}", "word " * (2 + i % 5), "ab"[i % 2], i % 9)
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, grp string, n int")
    path = str(tmp_path / "t")
    df.write.parquet(path)
    return path


def test_cli_suggest_prints_isomorph_draft(spark, table, capsys):
    from validr_spark.cli import main

    assert main(["suggest", "--input", table]) == 0
    draft = json.loads(capsys.readouterr().out)
    assert draft["$self"] == "dict"
    assert draft["grp"] == ["enum", "a", "b"]
    assert draft["doc_id"].startswith("str.minlen(4)")
    assert draft["n"] == ["enum", *range(9)]   # 9 distinct ≤ enum_max → enum
    # the draft is valid isomorph JSON: it parses back
    from validr_spark.schema import Schema
    Schema.parse_isomorph_schema(draft)


def test_cli_check_pass_and_fail_exit_codes(spark, table, tmp_path, capsys):
    from validr_spark.cli import main

    ok_spec = str(tmp_path / "ok.json")
    with open(ok_spec, "w") as f:
        json.dump({"name": "gate", "checks": [
            {"type": "row_count", "min": 10},
            {"type": "null_rate", "column": "text", "max": 0.01},
            {"type": "mean", "column": "n", "between": [0, 8]},
            {"type": "values_in", "column": "grp", "allowed": ["a", "b"]},
        ]}, f)
    assert main(["check", "--input", table, "--checks", ok_spec]) == 0
    out = [json.loads(line) for line in
           capsys.readouterr().out.strip().splitlines()]
    assert len(out) == 4 and all(r["passed"] for r in out)

    bad_spec = str(tmp_path / "bad.json")
    with open(bad_spec, "w") as f:
        json.dump({"checks": [{"type": "row_count", "min": 10_000}]}, f)
    assert main(["check", "--input", table, "--checks", bad_spec]) == 1
    row = json.loads(capsys.readouterr().out.strip())
    assert not row["passed"]
    assert row["message"].startswith("expect row_count")


def test_cli_prep_pipeline(spark, tmp_path, capsys):
    """prep subcommand: validate + exact dedup + quality filter, packed
    output, per-stage stats JSON on stdout."""
    from validr_spark.cli import main

    words = [f"pref{chr(97 + i % 26)}{chr(97 + i // 26)}suf" for i in range(30)]
    rows = [(i, " ".join(words[j] + f"x{chr(97 + i)}" for j in range(20)), "en")
            for i in range(8)]
    rows.append((100, rows[2][1], "en"))          # exact dup of doc 2
    rows.append((101, "tiny", "en"))              # too short -> quality drop
    rows.append((102, rows[0][1], "zz"))          # invalid lang
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    inp = str(tmp_path / "docs")
    df.write.parquet(inp)

    schema_file = str(tmp_path / "schema.json")
    with open(schema_file, "w") as f:
        json.dump({"$self": "dict", "doc_id": "int.min(0)",
                   "text": "str.minlen(3)",
                   "lang": ["enum", "en", "de"]}, f)

    out = str(tmp_path / "kept")
    packed = str(tmp_path / "packed")
    assert main(["prep", "--input", inp, "--schema", schema_file,
                 "--output", out, "--packed-output", packed,
                 "--no-near-dup", "--max-tokens", "64", "--stats"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["stats"]
    by = {s["stage"]: (s["rows_in"], s["rows_out"]) for s in stats}
    assert by["validate"] == (11, 10)
    assert by["exact_dedup"] == (10, 9)
    assert by["quality"] == (9, 8)
    assert by["pack"] == (8, 8)
    kept = spark.read.parquet(out)
    assert sorted(r.doc_id for r in kept.collect()) == list(range(8))
    assert spark.read.parquet(packed).count() == 8


def test_cli_report_data_card(spark, table, capsys):
    from validr_spark.cli import main

    assert main(["report", "--input", table, "--id-col", "doc_id",
                 "--text-col", "text", "--by", "grp"]) == 0
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert card["n_columns"] == 4
    cols = {c["column"]: c for c in card["columns"]}
    assert cols["doc_id"]["n_rows"] == 60 and cols["doc_id"]["n_nulls"] == 0
    assert card["uniqueness"]["n_dup_keys"] == 0
    assert {r["grp"] for r in card["encoding"]} == {"a", "b"}
    assert all(r["clean_frac"] == 1.0 for r in card["encoding"])
    assert card["text"]["total_tokens"] == sum(2 + i % 5 for i in range(60))


def test_cli_audit_rates_and_gate(spark, table, tmp_path, capsys):
    from validr_spark.cli import main

    schema_file = str(tmp_path / "audit_schema.json")
    with open(schema_file, "w") as f:
        json.dump({"$self": "dict", "n": "int.min(0).max(3)"}, f)

    # full-fraction audit: exact rates; n in [0,8] uniform-ish -> n.max
    # violations exist
    argv = ["audit", "--input", table, "--schema", schema_file,
            "--fraction", "1.0", "--id-cols", "doc_id",
            "--rules", "n.max", "n.min"]
    assert main(argv) == 0
    out = json.loads(capsys.readouterr().out)
    rates = {r["rule_id"]: r for r in out["rates"]}
    assert set(rates) == {"n.max", "n.min"}
    # 60 rows, n = i % 9 -> values 4..8 violate max(3)
    expect = sum(1 for i in range(60) if i % 9 > 3)
    assert rates["n.max"]["n_viol"] == expect
    assert rates["n.min"]["n_viol"] == 0
    assert rates["n.min"]["rate_hi"] > 0          # rule-of-three bound
    assert rates["n.max"]["rate"] == round(expect / 60, 6)

    # gate: max-rate below the observed rate -> exit 1
    assert main(argv + ["--max-rate", "0.01"]) == 1
    capsys.readouterr()
    assert main(argv + ["--max-rate", "0.99"]) == 0
    capsys.readouterr()


def test_cli_repair_roundtrip(spark, tmp_path, capsys):
    """repair subcommand: quarantine-shaped input -> repaired/irreparable
    parquet splits + one JSON report with per-rule accounting."""
    from validr_spark.cli import main

    rows = [("ok", 10, "en"), ("fix1", 999, "en"),   # n_tok -> default
            ("fix2", 10, "xx"),                      # lang -> default
            ("dead", -5, "qq")]                      # n_tok has default,
    # lang too -> fully repairable;     make one truly dead via doc_id
    rows.append(("", 10, "en"))                      # doc_id minlen fails
    df = spark.createDataFrame(rows, "doc_id string, n_tok int, lang string")
    inp = str(tmp_path / "quar")
    df.write.parquet(inp)
    schema_file = str(tmp_path / "schema.json")
    with open(schema_file, "w") as f:
        json.dump({"$self": "dict",
                   "doc_id": "str.minlen(1).maxlen(8)",
                   "n_tok": "int.min(1).max(100).default(50)",
                   "lang": ["enum", "en", "de", "fr"]}, f)
    # multi-item enum list form has no default param -> lang stays
    # irreparable; n_tok repairs
    rep_dir = str(tmp_path / "repaired")
    irr_dir = str(tmp_path / "irrep")
    assert main(["repair", "--input", inp, "--schema", schema_file,
                 "--id-cols", "doc_id",
                 "--repaired", rep_dir, "--irreparable", irr_dir]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_repaired_rows"] == 2           # ok + fix1
    assert report["n_irreparable_rows"] == 3        # fix2, dead, ""
    rules = {r["rule_id"]: r for r in report["rules"]}
    assert rules["n_tok.max"]["n_repaired"] == 1
    assert rules["n_tok.max"]["n_after"] == 0
    assert rules["lang.enum"]["n_repaired"] == 0
    got = {r["doc_id"]: r for r in
           spark.read.parquet(rep_dir).collect()}
    assert got["fix1"]["n_tok"] == 50
