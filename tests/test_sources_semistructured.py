"""Semi-structured (JSON/CSV) ingestion with validr-derived string
schemas (validr_spark/sources/tables.py validr_read_schema)."""

import json

import pytest
from pyspark.sql import functions as F

from validr_spark import T, SparkCompiler
from validr_spark.sources import read_table, validr_read_schema


def _schema():
    return T.dict(doc_id=T.int.min(0),
                  score=T.float.min(0).max(1),
                  tags=T.list(T.str.minlen(1)),
                  meta=T.dict(lang=T.enum(["en", "de"])))


def test_validr_read_schema_shape():
    st = validr_read_schema(_schema())
    assert st.simpleString() == ("struct<doc_id:string,score:string,"
                                 "tags:array<string>,"
                                 "meta:struct<lang:string>>")
    # shape-form union → variant (runtime per-row dispatch)
    st2 = validr_read_schema(T.dict(u=T.union([T.int, T.list(T.int)])))
    assert st2.simpleString() == "struct<u:variant>"
    # tagged union → struct of the tag + union of branch fields
    st3 = validr_read_schema(T.dict(ev=T.union(
        click=T.dict(x=T.int), view=T.dict(ms=T.int)).by("kind")))
    assert st3.simpleString() == \
        "struct<ev:struct<kind:string,x:string,ms:string>>"
    with pytest.raises(TypeError):
        validr_read_schema(T.int.min(0))


def test_union_json_roundtrip_end_to_end(spark, tmp_path):
    """VERDICT r02 item 5: isomorph-JSON union rows must ingest through
    validr_read_schema's variant leaf and come out of the compiled plan
    as per-shape violations with correct positions."""
    from validr_spark import SparkCompiler
    p = tmp_path / "u.jsonl"
    p.write_text("\n".join([
        '{"id": 0, "val": 5}',
        '{"id": 1, "val": [1, 2, 99]}',
        '{"id": 2, "val": {"a": 7}}',
        '{"id": 3, "val": {"a": -1}}',
        '{"id": 4, "val": "abc"}',
        '{"id": 5, "val": null}',
    ]) + "\n")
    schema = T.dict(id=T.int,
                    val=T.union([
                        T.int.min(0).max(9),
                        T.list(T.int.min(0).max(10)),
                        T.dict(a=T.int.min(0)),
                    ]).optional)
    df = read_table(spark, str(p), schema=schema)
    assert dict(df.dtypes)["val"] == "variant"
    res = (SparkCompiler().compile(schema)
           .apply(df.withColumn("_id", F.col("id").cast("long")),
                  id_cols=["_id"]))
    v = {r["_id"]: r for r in res.violations().collect()}
    assert set(v) == {1, 3, 4}
    assert v[1]["position"] == "val[2]"          # element index survives
    assert v[1]["message"] == "value must <= 10"
    assert v[3]["position"] == "val.a"           # dict branch, field pos
    assert v[3]["message"] == "value must >= 0"
    assert v[4]["rule_id"] == "val.type"         # scalar branch rejects
    clean = {r["_id"]: r["val"] for r in res.clean().collect()}
    assert clean[0]["scalar"] == 5
    assert clean[2]["dict"]["a"] == 7
    assert clean[5] is None                      # JSON null + optional


def test_json_numbers_and_strings_coerce_identically(spark, tmp_path):
    """JSON 123 and \"123\" both arrive as the string '123' and validate
    to the same long — the plan is the typed parser (reference str
    coercion, pyx:763-785)."""
    path = str(tmp_path / "in.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"doc_id": 7, "score": 0.5,
                            "tags": ["a", 2], "meta": {"lang": "en"}}) + "\n")
        f.write(json.dumps({"doc_id": "8", "score": ".25",
                            "tags": ["b"], "meta": {"lang": "de"}}) + "\n")
        f.write(json.dumps({"doc_id": -1, "score": "2.0",
                            "tags": [], "meta": {"lang": "zz"}}) + "\n")
    df = read_table(spark, path, schema=_schema())   # fmt auto via .jsonl
    assert dict(df.dtypes)["doc_id"] == "string"     # no inference
    res = SparkCompiler().compile(_schema()).apply(
        df.withColumn("_id", F.col("doc_id")), id_cols=["_id"])
    clean = {r.doc_id: r for r in res.clean().collect()}
    assert set(clean) == {7, 8}                    # doc_id typed long now
    assert clean[7].tags == ["a", "2"]             # JSON 2 -> "2" -> str
    assert clean[8].score == 0.25
    viol = {(r["_id"], r.rule_id) for r in res.violations().collect()}
    assert ("-1", "doc_id.min") in viol
    assert ("-1", "score.max") in viol
    assert ("-1", "meta.lang.enum") in viol


def test_csv_reads_with_header_and_validates(spark, tmp_path):
    path = str(tmp_path / "in.csv")
    with open(path, "w") as f:
        f.write("doc_id,lang\n1,en\n2,de\nx,en\n")
    sch = T.dict(doc_id=T.int.min(0), lang=T.enum(["en", "de"]))
    df = read_table(spark, path, schema=sch)
    res = SparkCompiler().compile(sch).apply(
        df.withColumn("_id", F.col("doc_id")), id_cols=["_id"])
    assert res.clean().count() == 2
    v = res.violations().collect()
    assert len(v) == 1 and v[0].rule_id.startswith("doc_id.")


def test_cli_validate_reads_jsonl(spark, tmp_path, capsys):
    """End-to-end: cli validate over a .jsonl input uses the derived
    string schema (no inference) and reports violations."""
    from validr_spark.cli import main

    inp = str(tmp_path / "rows.jsonl")
    with open(inp, "w") as f:
        f.write(json.dumps({"doc_id": "a1", "n": 3, "part": "p0"}) + "\n")
        f.write(json.dumps({"doc_id": "a2", "n": -5, "part": "p0"}) + "\n")
    schema_file = str(tmp_path / "schema.json")
    with open(schema_file, "w") as f:
        json.dump({"$self": "dict", "doc_id": "str.minlen(1)",
                   "n": "int.min(0)", "part": "str"}, f)
    rc = main(["validate", "--input", inp, "--schema", schema_file,
               "--part-col", "part",
               "--violations", str(tmp_path / "viol"),
               "--manifest", str(tmp_path / "mani"),
               "--id-cols", "doc_id"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_parts_processed"] == 1
    v = spark.read.parquet(str(tmp_path / "viol")).collect()
    assert len(v) == 1 and v[0].rule_id == "n.min"


def test_union_schema_on_parquet_does_not_raise(spark, tmp_path):
    """`schema` is ignored for parquet reads, so a union-containing validr
    schema must not trip validr_read_schema there."""
    p = str(tmp_path / "t")
    spark.createDataFrame([(1,)], "x long").write.parquet(p)
    sch = T.dict(u=T.union([T.int, T.list(T.int)]))
    assert read_table(spark, p, schema=sch).count() == 1


def test_read_json_corrupt_capture(spark, tmp_path):
    from validr_spark.sources.tables import read_table
    p = tmp_path / "rows.jsonl"
    p.write_text('{"a": "1", "b": "x"}\n'
                 '{"a": truncated\n'
                 '{"a": "2", "b": "y"}\n')
    df = read_table(spark, str(p), schema="a string, b string",
                    corrupt_col="_bad")
    rows = df.collect()
    good = [(r["a"], r["b"]) for r in rows if r["_bad"] is None]
    bad = [r["_bad"] for r in rows if r["_bad"] is not None]
    assert sorted(good) == [("1", "x"), ("2", "y")]
    assert bad == ['{"a": truncated']        # captured verbatim
    # quarantine filter keeps full rows (and a data column, SPARK-21610)
    q = df.filter(F.col("_bad").isNotNull()).select("a", "_bad").collect()
    assert len(q) == 1 and q[0]["a"] is None


def test_read_csv_corrupt_capture(spark, tmp_path):
    from validr_spark.sources.tables import read_table
    p = tmp_path / "rows.csv"
    p.write_text("a,b\n1,x\n2\n3,y\n")
    df = read_table(spark, str(p), schema="a string, b string",
                    corrupt_col="_bad")
    rows = df.collect()
    assert sorted(r["_bad"] for r in rows if r["_bad"] is not None) == ["2"]
    assert sorted((r["a"], r["b"]) for r in rows if r["_bad"] is None) == [
        ("1", "x"), ("3", "y")]


def test_corrupt_col_requires_schema(spark, tmp_path):
    import pytest
    from validr_spark.sources.tables import read_table
    p = tmp_path / "rows.jsonl"
    p.write_text('{"a": 1}\n')
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(p), corrupt_col="_bad")


def test_file_report_matches_filesystem(spark, tmp_path):
    import os
    from validr_spark.operators.files import file_report, small_file_advice
    # two differently-schema'd datasets, several files each
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(1000).repartition(4).write.parquet(d1)
    (spark.range(10).selectExpr("cast(id as string) s")
     .repartition(2).write.parquet(d2))
    rep = file_report(spark, [d1, d2]).collect()
    disk = {}
    for d in (d1, d2):
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                disk[f] = os.path.getsize(os.path.join(d, f))
    got = {os.path.basename(r["file"]): r["bytes"] for r in rep}
    assert got == disk                       # every physical file, exact bytes
    assert sum(r["n_rows"] for r in rep) == 1010
    adv = small_file_advice(spark, [d1, d2],
                            target_bytes=1 << 20).collect()[0]
    assert adv["n_files"] == len(disk) == 6
    assert adv["total_bytes"] == sum(disk.values())
    assert adv["small_files"] == 6           # all tiny vs 1MB target
    assert adv["advised_files"] == 1         # compact to one file


def test_file_report_rowcounts_match_duckdb(spark, tmp_path):
    import duckdb
    from validr_spark.operators.files import file_report
    d = str(tmp_path / "c")
    spark.range(500).repartition(3).write.parquet(d)
    rep = {"/" + r["file"].split(":", 1)[-1].lstrip("/"): r["n_rows"]
           for r in file_report(spark, d).collect()}
    duck = dict(duckdb.sql(
        f"SELECT file_name, num_rows FROM "
        f"parquet_file_metadata('{d}/*.parquet')").fetchall())
    assert rep == {k: v for k, v in duck.items()}


def test_file_report_includes_zero_row_files(spark, tmp_path):
    from validr_spark.operators.files import file_report, small_file_advice
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = str(tmp_path / "z")
    spark.range(10).repartition(2).write.parquet(d)
    # footer-only empty part files (what a heavily-filtered write leaves
    # behind): zero _metadata scan rows, but very much on disk
    for i in range(3):
        pq.write_table(pa.table({"id": pa.array([], type=pa.int64())}),
                       f"{d}/part-empty-{i}.parquet")
    rep = file_report(spark, d).collect()
    assert len(rep) == 5                       # all physical part files
    assert sum(r["n_rows"] for r in rep) == 10
    assert sum(1 for r in rep if r["n_rows"] == 0) == 3
    adv = small_file_advice(spark, d, target_bytes=1 << 20).collect()[0]
    assert adv["n_files"] == 5                 # empty files counted


def test_corrupt_col_rejected_for_parquet(spark, tmp_path):
    # review finding: silently ignored for self-describing formats
    from validr_spark.sources.tables import read_table
    p = str(tmp_path / "t2")
    spark.createDataFrame([(1,)], "x long").write.parquet(p)
    with pytest.raises(ValueError, match="JSON/CSV"):
        read_table(spark, p, corrupt_col="_bad")


def test_tagged_union_json_roundtrip(spark, tmp_path):
    """Tagged-form unions read as the struct of tag + union-of-branch
    fields (validr_read_schema) and dispatch on the tag at validate."""
    from validr_spark import SparkCompiler
    p = tmp_path / "ev.jsonl"
    p.write_text("\n".join([
        '{"id": 0, "ev": {"kind": "click", "x": "3"}}',
        '{"id": 1, "ev": {"kind": "view", "ms": "250"}}',
        '{"id": 2, "ev": {"kind": "hover"}}',
        '{"id": 3, "ev": {"kind": "click", "x": "-1"}}',
    ]) + "\n")
    schema = T.dict(id=T.int,
                    ev=T.union(click=T.dict(x=T.int.min(0)),
                               view=T.dict(ms=T.int)).by("kind"))
    df = read_table(spark, str(p), schema=schema)
    assert dict(df.dtypes)["ev"] == \
        "struct<kind:string,x:string,ms:string>"
    res = (SparkCompiler().compile(schema)
           .apply(df.withColumn("_id", F.col("id").cast("long")),
                  id_cols=["_id"]))
    v = {r["_id"]: r for r in res.violations().collect()}
    assert v[2]["rule_id"] == "ev.kind.enum"
    assert v[3]["position"] == "ev.x"
    assert v[3]["message"] == "value must >= 0"
    clean = {r["_id"]: r["ev"] for r in res.clean().collect()}
    assert clean[0]["kind"] == "click" and clean[0]["x"] == 3
    assert clean[1]["kind"] == "view" and clean[1]["ms"] == 250
