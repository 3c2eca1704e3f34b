"""Benchmark harness (driver-run per round).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "sequences_per_sec": ..., "tokens_per_sec": ..., "parallelism": N}

The north-star throughput metric (validated sequences/s, tokens/s on the
tokenized-sequence table with 1% injected violations) is measured on a
pre-materialized parquet copy of the generated table so the timing covers
scan → validate → aggregate, like a real cluster run.  Two-cluster-size
scaling evidence is produced by tools/bench_scaling.py (local[8] vs
local[32] subprocesses) into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEQ_ROWS = int(os.environ.get("SPARK_GRAFT_SEQ_ROWS", "1000000"))
SEQ_MAXLEN = int(os.environ.get("SPARK_GRAFT_SEQ_MAXLEN", "256"))
SEQ_CACHE = os.environ.get("SPARK_GRAFT_SEQ_CACHE",
                           f"/tmp/validr_spark_seq_{SEQ_ROWS}_{SEQ_MAXLEN}")


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("validr_spark_bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_seq_table(spark):
    """Materialize the deterministic sequences table once (excluded from
    timing: we benchmark the engine, not the generator).

    Partition count is FIXED (not CPU-derived): the same files must feed
    both parallelism levels of the scaling bench, and there must be enough
    splits to keep the largest level busy (128 ≥ 4×32 tasks/core-wave).
    """
    from validr_spark.datagen import make_sequences

    marker = os.path.join(SEQ_CACHE, "_SUCCESS")
    if not os.path.exists(marker):
        (make_sequences(spark, SEQ_ROWS, maxlen=SEQ_MAXLEN, partitions=128)
         .write.mode("overwrite").parquet(SEQ_CACHE))
    return spark.read.parquet(SEQ_CACHE)


def bench_sequences(spark) -> dict:
    """North-star job: full row validation + per-source verdicts +
    uniqueness + referential + consistency, one pass each."""
    from pyspark.sql import functions as F

    from validr_spark.compiler import SparkCompiler
    from validr_spark.datagen import make_sources_dim, sequences_schema
    from validr_spark.operators.referential import orphan_count
    from validr_spark.operators.uniqueness import duplication_report

    seq = ensure_seq_table(spark)
    plan = SparkCompiler().compile(sequences_schema())
    dim = make_sources_dim(spark)

    t0 = time.time()
    res = plan.apply(seq, id_cols=["doc_id"])
    agg = res.df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.size("tokens")).alias("tokens"),
        F.sum(F.size("_violations")).alias("violations"),
    ).collect()[0]
    verd = res.verdicts("source").collect()
    dup = duplication_report(seq, "doc_id").collect()[0]
    orph = orphan_count(seq, dim, on="source").collect()[0][0]
    consist = seq.filter(F.col("n_tok") != F.size("tokens")).count()
    dt = time.time() - t0
    return {
        "rows": agg["rows"], "tokens": int(agg["tokens"] or 0),
        "violations": int(agg["violations"] or 0),
        "dup_keys": dup["n_dup_keys"], "orphans": orph,
        "inconsistent": consist,
        "n_verdict_groups": len(verd),
        "seconds": dt,
        "sequences_per_sec": agg["rows"] / dt,
        "tokens_per_sec": int(agg["tokens"] or 0) / dt,
    }


HEADLINE = [
    "validate_documents", "lineitem_violations", "tpch_q1", "events_chi2",
    "ks_drift", "dedup_prefix", "token_counts", "ann_topk",
    "events_validate", "minhash_pairs", "simhash_pairs", "text_profile",
]


def main():
    import __spark_entry__ as entrymod

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM/codegen with one tiny job so q1 isn't charged for startup
    spark.range(1000).count()
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
    seq = bench_sequences(spark)
    timings["sequences_validate_1m"] = round(seq["seconds"], 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline query wall time (validate/dedup/drift/ann) + "
                  "sequence-validation throughput",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "parallelism": CPUS,
        "seq_rows": seq["rows"],
        "seq_tokens": seq["tokens"],
        "seq_violations": seq["violations"],
        "sequences_per_sec": round(seq["sequences_per_sec"], 1),
        "tokens_per_sec": round(seq["tokens_per_sec"], 1),
    }))


if __name__ == "__main__":
    main()
