"""spark-submit entry point: distributed schema validation as a job.

Usage (north-rule launch shape):

    spark-submit --master <cluster> --py-files validr_spark.zip \\
        -m validr_spark.cli ... # or a tiny driver file calling main()

    python -m validr_spark.cli validate \\
        --input /data/sequences --schema schema.json --part-col source \\
        --violations /out/violations --manifest /out/manifest \\
        --id-cols doc_id [--batch-parts 64] [--fresh]

The schema file is validr's isomorph JSON form, e.g.::

    {"$self": "dict",
     "doc_id": "str.minlen(1).maxlen(64)",
     "tokens": ["int.min(0).max(50256)"],
     "n_tok": "int.min(1)",
     "source": ["enum", "web", "books", "code", "wiki", "forums"]}

(NB: multi-item enums use the ``["enum", item, ...]`` list form;
``"enum('a b c')"`` element strings follow reference semantics and treat
the string as a set of CHARACTERS — same as guyskk/validr.)
Re-running the same command resumes: partitions with a ``done`` manifest
row for the current lineage are skipped (see plans/manifest.py).
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys


def _build_session(master: str | None, shuffle_partitions: int | None):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("validr_spark")
    if master:
        b = b.master(master)
    b = (b.config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true"))
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()


def cmd_validate(args) -> int:
    from .compiler import SparkCompiler
    from .plans import ResumableValidation
    from .schema import T
    from .sources import TableSource

    with open(args.schema) as f:
        schema_obj = json.load(f)
    tschema = T(schema_obj)
    plan = SparkCompiler().compile(tschema)

    spark = _build_session(args.master, args.shuffle_partitions)
    # the schema reaches the reader too: JSON/CSV inputs read with the
    # derived all-string StructType (no inference scan); parquet/iceberg
    # ignore it (they carry their own schema)
    df = TableSource(args.input, fmt=args.format, schema=tschema).load(spark)

    # --fresh[=TOKEN]: deterministic token (default: today's UTC date), so
    # a crashed fresh run resumes by re-running the same command — a random
    # per-invocation lineage would restart every partition on each retry.
    if args.fresh is None:
        extra = ""
    else:
        extra = args.fresh or datetime.datetime.now(
            datetime.timezone.utc).date().isoformat()

    run = ResumableValidation(
        plan, part_col=args.part_col,
        manifest_path=args.manifest, violations_path=args.violations,
        batch_parts=args.batch_parts,
        extra_lineage=extra,
        quarantine_path=args.quarantine,
        output_partitions=args.output_partitions,
        input_path=args.input if args.parts_from_layout else None,
    )
    import time
    t0 = time.time()
    report = run.run(spark, df, id_cols=args.id_cols)
    # job wall time (excludes JVM/session start — the constant launch
    # overhead a long-lived cluster amortizes; includes planning,
    # validation, violation/manifest writes)
    report["seconds"] = round(time.time() - t0, 3)
    print(json.dumps(report))
    return 0


def cmd_repair(args) -> int:
    """Bulk-repair rows with the schema's own declared defaults
    (operators/repair.py) — the offline step between ``validate
    --quarantine`` and re-ingestion.  Writes now-clean rows to
    ``--repaired`` (and still-failing ones to ``--irreparable``), prints
    one JSON report with per-rule before/after/repaired counts.
    """
    from .compiler import SparkCompiler
    from .operators.repair import repair
    from .schema import T
    from .sources import TableSource

    with open(args.schema) as f:
        tschema = T(json.load(f))
    spark = _build_session(args.master, args.shuffle_partitions)
    df = TableSource(args.input, fmt=args.format, schema=tschema).load(spark)
    strict_v = (SparkCompiler().compile(tschema)
                .apply(df, id_cols=args.id_cols).violations())
    out = repair(tschema, df, id_cols=args.id_cols,
                 use_optional_null=args.use_optional_null)
    # Four consumers (two writes, two aggregates) share one lenient
    # validation: persist the annotated parent so the input is scanned
    # once per plan (strict + lenient), not once per consumer.
    out.annotated.persist()
    try:
        out.repaired.write.mode("overwrite").parquet(args.repaired)
        if args.irreparable:
            out.irreparable.write.mode("overwrite").parquet(
                args.irreparable)
        # both counts in ONE job over the persisted parent — no parquet
        # read-back jobs
        from pyspark.sql import functions as F
        bad = F.size(F.col("_violations")) > 0
        cnt = out.annotated.agg(
            F.sum(F.when(~bad, 1).otherwise(0)).alias("n_rep"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("n_irr")).first()
        rules = [r.asDict() for r in out.report(strict_v).collect()]
    finally:
        out.annotated.unpersist()
    print(json.dumps({
        "n_repaired_rows": cnt["n_rep"] or 0,
        "n_irreparable_rows": (cnt["n_irr"] or 0) if args.irreparable
        else None,
        "rules": rules,
    }))
    return 0


def cmd_suggest(args) -> int:
    """Profile a table and print a drafted validr schema (isomorph JSON)
    — feed the edited draft back to ``validate --schema``."""
    from .operators.suggest import suggest_schema

    spark = _build_session(args.master, None)
    from .sources import TableSource
    df = TableSource(args.input, fmt=args.format).load(spark)
    schema = suggest_schema(df, enum_max=args.enum_max)
    print(json.dumps(schema.to_primitive(), indent=2))
    return 0


def cmd_check(args) -> int:
    """Run a declarative table-level check suite from a JSON spec.

    Spec file: {"name": ..., "checks": [{"type": "null_rate",
    "column": "text", "max": 0.05}, {"type": "row_count", "min": 1}, ...]}
    — "type" is any Check factory name; the rest are its kwargs.
    Exit code 1 if any check fails (CI-gate shape).
    """
    from .operators.checks import Check, CheckSuite
    from .sources import TableSource

    with open(args.checks) as f:
        spec = json.load(f)
    checks = []
    for c in spec["checks"]:
        kw = dict(c)
        factory = getattr(Check, kw.pop("type"))
        kw = {k: (tuple(v) if isinstance(v, list) and k == "between" else v)
              for k, v in kw.items()}
        checks.append(factory(**kw))
    suite = CheckSuite(spec.get("name", "cli_suite"), checks)

    spark = _build_session(args.master, None)
    df = TableSource(args.input, fmt=args.format).load(spark)
    report = suite.run(df)
    rows = [r.asDict() for r in report.collect()]
    for r in rows:
        print(json.dumps(r))
    return 0 if all(r["passed"] for r in rows) else 1


def cmd_prep(args) -> int:
    """Run the composed training-data prep pipeline (pipeline.py):
    validate → exact dedup → near-dup → quality filter [→ packing],
    writing surviving rows (and optionally bin assignments) to parquet.

    ``--stats`` triggers per-stage counting jobs; omit it at scale to
    keep the whole pipeline one lazy plan ending in the write."""
    from .pipeline import prepare_training_data
    from .schema import T
    from .sources import TableSource

    schema = None
    if args.schema:
        with open(args.schema) as f:
            schema = T(json.load(f))
    spark = _build_session(args.master, args.shuffle_partitions)
    df = TableSource(args.input, fmt=args.format, schema=schema).load(spark)
    res = prepare_training_data(
        df, schema, id_col=args.id_col, text_col=args.text_col,
        max_tokens=args.max_tokens, near_dup=not args.no_near_dup,
        jaccard_threshold=args.jaccard_threshold,
        drop_bad_encoding=args.drop_bad_encoding,
        pack=args.packed_output is not None,
        collect_stats=args.stats)
    res.kept.write.mode("overwrite").parquet(args.output)
    if args.packed_output:
        res.packed.write.mode("overwrite").parquet(args.packed_output)
    print(json.dumps({"stats": res.stats}))
    return 0


def cmd_diff(args) -> int:
    """Classify a schema change (schemadiff.py): prints each path-level
    delta plus the verdict, and exits 1 when the change requires
    re-validation (outputs_changed / narrowed / breaking) — the CI gate
    for 'can I ship this schema edit without reprocessing?'.  No Spark
    session: pure driver-side tree walk."""
    from .schema import T
    from .schemadiff import diff_verdict, schema_diff

    with open(args.old) as f:
        old = T(json.load(f))
    with open(args.new) as f:
        new = T(json.load(f))
    entries = schema_diff(old, new)
    verdict = diff_verdict(entries)
    for e in entries:
        print(json.dumps(e))
    print(json.dumps({"verdict": verdict}))
    return 0 if verdict in ("identical", "compatible") else 1


def cmd_manifest(args) -> int:
    from .plans import ManifestStore

    spark = _build_session(args.master, None)
    store = ManifestStore(spark, args.manifest)
    rows = store.read().orderBy("finished_at").collect()
    for r in rows:
        print(json.dumps(r.asDict()))
    return 0


def cmd_report(args) -> int:
    """One-stop dataset card: column profile, uniqueness, encoding
    hygiene, quality/token summary — printed as one JSON document.

    Every section is an AGGREGATED result (profile rows, per-source
    report rows, one-row summaries); nothing row-shaped is ever
    collected, so the command is safe to point at the full corpus."""
    from .operators.encoding import encoding_report
    from .operators.stats import column_profile
    from .operators.textstats import quality_score, token_count, words_of
    from .operators.uniqueness import duplication_report
    from .sources import TableSource
    from pyspark.sql import functions as F

    spark = _build_session(args.master, args.shuffle_partitions)
    df = TableSource(args.input, fmt=args.format).load(spark)
    card: dict = {"input": args.input, "n_columns": len(df.columns)}

    card["columns"] = [r.asDict() for r in column_profile(df).collect()]

    if args.id_col in df.columns:
        dup = duplication_report(df, args.id_col).first()
        card["uniqueness"] = dup.asDict() if dup is not None else None

    if args.text_col in df.columns:
        by = args.by if args.by and args.by in df.columns else None
        card["encoding"] = [r.asDict() for r in
                            encoding_report(df, args.text_col,
                                            by=by).collect()]
        w = words_of(F.col(args.text_col))
        tq = df.select(
            token_count(F.col(args.text_col)).alias("_nt"),
            quality_score(F.col(args.text_col), w).alias("_q"))
        row = tq.agg(
            F.sum("_nt").alias("total_tokens"),
            F.round(F.avg("_nt"), 2).alias("avg_tokens"),
            F.round(F.avg("_q"), 4).alias("avg_quality"),
            F.round(F.avg((F.col("_q") >= 0.5).cast("double")), 4)
            .alias("quality_keep_rate")).first()
        card["text"] = row.asDict()

    print(json.dumps(card, default=str))
    return 0


def cmd_audit(args) -> int:
    """Sampled validation audit: validate a deterministic md5-threshold
    sample and print per-rule violation rates with Wilson 95% bounds as
    one JSON document — the cheap continuous-monitoring companion to the
    full ``validate`` run (see operators/audit.py)."""
    from .compiler import SparkCompiler
    from .operators.audit import sampled_violation_rates
    from .schema import T
    from .sources import TableSource

    with open(args.schema) as f:
        tschema = T(json.load(f))
    plan = SparkCompiler().compile(tschema)
    spark = _build_session(args.master, args.shuffle_partitions)
    df = TableSource(args.input, fmt=args.format, schema=tschema).load(spark)
    rates = sampled_violation_rates(
        df, plan, fraction=args.fraction, id_cols=args.id_cols,
        seed=args.seed, rules=args.rules or None)
    rows = [r.asDict() for r in rates.collect()]
    rows.sort(key=lambda r: r["rule_id"])
    # an empty sample yields NULL rates (no data ≠ clean data): surface
    # it and, when gating, fail safe instead of passing vacuously
    empty = any(r["rate"] is None for r in rows)
    print(json.dumps({"input": args.input, "fraction": args.fraction,
                      "seed": args.seed, "empty_sample": empty,
                      "rates": rows}))
    return 1 if args.max_rate is not None and (empty or any(
        r["rate"] is not None and r["rate"] > args.max_rate
        for r in rows)) else 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="validr_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="resumable validation run")
    v.add_argument("--input", required=True)
    v.add_argument("--format", default="auto",
                   help="auto|parquet|iceberg|table")
    v.add_argument("--schema", required=True,
                   help="isomorph-JSON schema file")
    v.add_argument("--part-col", required=True)
    v.add_argument("--violations", required=True)
    v.add_argument("--manifest", required=True)
    v.add_argument("--id-cols", nargs="*", default=[])
    v.add_argument("--quarantine", default=None,
                   help="also write failing rows (coerced shape + "
                        "n_violations) here, partitioned like violations")
    v.add_argument("--batch-parts", type=int, default=64)
    v.add_argument("--output-partitions", type=int, default=64,
                   help="cap on files per batch write (violations/"
                        "quarantine are hash-repartitioned by _part to "
                        "this width before partitionBy; 0 = keep the "
                        "scan's task layout)")
    v.add_argument("--parts-from-layout", action="store_true",
                   help="discover partition keys from the input's "
                        "hive-style part-col=value directory names (one "
                        "metadata listing) instead of a full-column "
                        "distinct scan; use only when --part-col IS the "
                        "table's physical partition column")
    v.add_argument("--fresh", nargs="?", const="", default=None,
                   metavar="TOKEN",
                   help="ignore existing checkpoints: fork the lineage with "
                        "TOKEN (default: today's UTC date, so retries of "
                        "the same fresh run stay resumable)")
    v.add_argument("--master", default=None)
    v.add_argument("--shuffle-partitions", type=int, default=None)
    v.set_defaults(fn=cmd_validate)

    rr = sub.add_parser("repair", help="bulk-repair quarantined rows with "
                        "the schema's declared defaults")
    rr.add_argument("--input", required=True,
                    help="quarantine dir (or any table in the schema's "
                         "input shape)")
    rr.add_argument("--format", default="auto")
    rr.add_argument("--schema", required=True,
                    help="isomorph-JSON schema file (same as validate)")
    rr.add_argument("--id-cols", nargs="*", default=[])
    rr.add_argument("--repaired", required=True,
                    help="parquet dir for now-clean rows")
    rr.add_argument("--irreparable", default=None,
                    help="parquet dir for rows still failing after repair")
    rr.add_argument("--use-optional-null", action="store_true",
                    help="also repair invalid OPTIONAL fields to their "
                         "null value (loses information a default does "
                         "not; off by default)")
    rr.add_argument("--master", default=None)
    rr.add_argument("--shuffle-partitions", type=int, default=None)
    rr.set_defaults(fn=cmd_repair)

    au = sub.add_parser("audit", help="sampled validation audit: per-rule "
                        "violation rates with Wilson bounds (exit 1 if any "
                        "rate exceeds --max-rate)")
    au.add_argument("--input", required=True)
    au.add_argument("--format", default="auto")
    au.add_argument("--schema", required=True,
                    help="isomorph-JSON schema file")
    au.add_argument("--fraction", type=float, default=0.01)
    au.add_argument("--id-cols", nargs="+", required=True)
    au.add_argument("--seed", default="42")
    au.add_argument("--rules", nargs="*", default=None,
                    help="rule inventory: also report clean rules with "
                         "their Wilson upper bound")
    au.add_argument("--max-rate", type=float, default=None,
                    help="CI gate: exit 1 when any observed rate exceeds")
    au.add_argument("--master", default=None)
    au.add_argument("--shuffle-partitions", type=int, default=None)
    au.set_defaults(fn=cmd_audit)

    s = sub.add_parser("suggest", help="draft a validr schema from a table")
    s.add_argument("--input", required=True)
    s.add_argument("--format", default="auto")
    s.add_argument("--enum-max", type=int, default=12)
    s.add_argument("--master", default=None)
    s.set_defaults(fn=cmd_suggest)

    c = sub.add_parser("check", help="run a declarative check suite "
                                     "(exit 1 on any failure)")
    c.add_argument("--input", required=True)
    c.add_argument("--format", default="auto")
    c.add_argument("--checks", required=True, help="JSON check-suite spec")
    c.add_argument("--master", default=None)
    c.set_defaults(fn=cmd_check)

    pr = sub.add_parser("prep", help="composed training-data prep pipeline")
    pr.add_argument("--input", required=True)
    pr.add_argument("--format", default="auto")
    pr.add_argument("--schema", default=None,
                    help="isomorph-JSON schema file (omit to skip validation)")
    pr.add_argument("--output", required=True, help="kept-rows parquet dir")
    pr.add_argument("--packed-output", default=None,
                    help="bin-assignment parquet dir (enables packing)")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--text-col", default="text")
    pr.add_argument("--max-tokens", type=int, default=2048)
    pr.add_argument("--no-near-dup", action="store_true")
    pr.add_argument("--jaccard-threshold", type=float, default=0.8)
    pr.add_argument("--drop-bad-encoding", action="store_true",
                    help="gate on encoding hygiene before dedup "
                         "(zero-shuffle filter)")
    pr.add_argument("--stats", action="store_true",
                    help="count rows per stage (extra jobs)")
    pr.add_argument("--master", default=None)
    pr.add_argument("--shuffle-partitions", type=int, default=None)
    pr.set_defaults(fn=cmd_prep)

    d = sub.add_parser("diff", help="classify a schema change (exit 1 if "
                                    "it requires re-validation)")
    d.add_argument("old", help="old isomorph-JSON schema file")
    d.add_argument("new", help="new isomorph-JSON schema file")
    d.set_defaults(fn=cmd_diff)

    rp = sub.add_parser("report", help="dataset card: profile, uniqueness, "
                                       "encoding hygiene, quality (JSON)")
    rp.add_argument("--input", required=True)
    rp.add_argument("--format", default="auto")
    rp.add_argument("--id-col", default="doc_id")
    rp.add_argument("--text-col", default="text")
    rp.add_argument("--by", default="source",
                    help="group column for the encoding section")
    rp.add_argument("--master", default=None)
    rp.add_argument("--shuffle-partitions", type=int, default=None)
    rp.set_defaults(fn=cmd_report)

    m = sub.add_parser("manifest", help="dump a manifest table")
    m.add_argument("--manifest", required=True)
    m.add_argument("--master", default=None)
    m.set_defaults(fn=cmd_manifest)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())


def console_main() -> None:
    """setuptools console-script entry point (pyproject [project.scripts])
    — argparse exit-code contract wrapped for sys.exit."""
    sys.exit(main())
