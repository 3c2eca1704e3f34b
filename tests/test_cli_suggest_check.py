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
