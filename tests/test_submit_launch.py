"""End-to-end launch-shape test: the north-rule run form is
``spark-submit --py-files validr_spark.zip`` (tools/submit.sh).  This
proves the zip is the ONLY artifact executors need — a fresh JVM +
fresh Python driver with no repo on sys.path must package, launch,
validate, write violations + manifest, and resume idempotently.

Two real spark-submit JVM starts (~40 s each); kept to one module so
the cost is paid once and visible.
"""
import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(REPO, "tools", "submit.sh")


@pytest.fixture(scope="module")
def job(spark, tmp_path_factory):
    """Tiny sequences-shaped input with two deterministic violations,
    plus the isomorph-JSON schema file the CLI documents."""
    from pyspark.sql import functions as F

    tmp = tmp_path_factory.mktemp("submit")
    rows = [(f"d{i:04d}",
             [i % 50, (i * 7) % 50, 200 if i == 17 else (i * 13) % 50],
             0 if i == 42 else 3,
             "web" if i % 2 == 0 else "books")
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    inp = str(tmp / "seq")
    df.coalesce(2).write.parquet(inp)

    schema = {"$self": "dict",
              "doc_id": "str.minlen(1).maxlen(64)",
              "tokens": ["int.min(0).max(99)"],
              "n_tok": "int.min(1)",
              "source": ["enum", "web", "books"]}
    schema_path = str(tmp / "schema.json")
    with open(schema_path, "w") as f:
        json.dump(schema, f)
    out = {"input": inp, "schema": schema_path,
           "violations": str(tmp / "viol"), "manifest": str(tmp / "manifest")}
    _ = F  # fixture only needs the session
    return out


def _submit(job):
    cmd = ["bash", SUBMIT, "local[2]", "validate",
           "--input", job["input"], "--schema", job["schema"],
           "--part-col", "source", "--id-cols", "doc_id",
           "--violations", job["violations"], "--manifest", job["manifest"],
           "--shuffle-partitions", "4"]
    env = dict(os.environ)
    # the child JVM must not inherit the test session's master/ports
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=600, env=env, cwd=REPO)


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end_and_resume(spark, job):
    res = _submit(job)
    assert res.returncode == 0, res.stderr[-4000:]
    report = json.loads(
        [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1])
    assert report["n_parts_total"] == 2
    assert report["n_parts_processed"] == 2
    assert sorted(report["parts"]) == ["books", "web"]

    viol = spark.read.parquet(job["violations"])
    got = {(r["doc_id"], r["rule_id"]) for r in viol.collect()}
    assert ("d0042", "n_tok.min") in got              # injected n_tok=0
    assert any(d == "d0017" and "max" in r for d, r in got)  # token 200>99
    assert len(got) == 2

    # Same command again = resume: manifest says both parts are done for
    # this lineage, so nothing is pending and nothing reprocesses.
    res2 = _submit(job)
    assert res2.returncode == 0, res2.stderr[-4000:]
    report2 = json.loads(
        [ln for ln in res2.stdout.splitlines() if ln.startswith("{")][-1])
    assert report2["n_parts_pending"] == 0
    assert report2["n_parts_processed"] == 0
    # violations were not duplicated by the no-op resume
    assert spark.read.parquet(job["violations"]).count() == 2
