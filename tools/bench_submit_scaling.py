"""Launch-shape scaling evidence: the SAME validation job submitted via
``tools/submit.sh`` (``spark-submit --py-files validr_spark.zip`` — the
north-rule run form) at local[N] and local[4N], on the same tmpfs-cached
64M-row sequences table.

This complements tools/bench_scaling.py (in-process sessions, the
primary steady-state protocol): here every run is a REAL cold
spark-submit launch, so it evidences that the packaged job — zip-only
artifact, CLI driver, manifest/violation writes included — scales the
same way the in-process engine does.  Efficiency uses the job wall time
the CLI reports (``seconds`` in the validate report JSON), which
excludes the constant JVM/session start a long-lived cluster amortizes
but includes planning, validation, and all output writes.

Levels are interleaved (N, 4N, N, 4N, ...) so co-tenant noise hits both
levels alike; best and median are both reported, all runs listed.

Usage:  python tools/bench_submit_scaling.py [runs_per_level]
Output: one JSON line + a refreshed "spark-submit launch-shape scaling"
custom section in BENCH.md (below the preserved-sections marker).
"""
from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(REPO, "tools", "submit.sh")
BENCH_MD = os.path.join(REPO, "BENCH.md")
CUSTOM_MARK = "<!-- custom sections below are preserved -->"
SECTION_HEAD = "## spark-submit launch-shape scaling"

PAIR = tuple(int(x) for x in
             os.environ.get("SPARK_GRAFT_SUBMIT_PAIR", "2:8").split(":"))


def ensure_input() -> str:
    """Materialize the sequences table on tmpfs — 64M rows (~17 GB).

    Size matters because every spark-submit run is a COLD JVM: the
    one-time Catalyst codegen + C2 JIT of the validation projection is
    ~30 s regardless of parallelism (PERF.md Finding 2), a fixed cost a
    10^12-row production run amortizes to nothing.  The CLI's
    phase_seconds report shows it inside validate_write.  At 8M rows
    that fixed term caps measurable efficiency at ~0.5; at 64M rows the
    scan dominates and the ratio measures the engine."""
    os.environ.setdefault("SPARK_GRAFT_SEQ_ROWS", "64000000")
    # hive-partitioned by source — the production table shape (Iceberg
    # partition spec on `source`); lets the CLI discover partition keys
    # from the directory listing (--parts-from-layout) instead of a
    # full-column distinct scan, removing one serial term from every run
    os.environ.setdefault("SPARK_GRAFT_SEQ_PARTBY", "source")
    rows = os.environ["SPARK_GRAFT_SEQ_ROWS"]
    os.environ.setdefault(
        "SPARK_GRAFT_SEQ_CACHE",
        f"/dev/shm/validr_spark_seq_scaling{int(rows) // 1000000}p")
    sys.path.insert(0, REPO)
    import bench
    marker = os.path.join(bench.SEQ_CACHE, "_SUCCESS")
    if not os.path.exists(marker):
        spark = bench.build_session(16)
        spark.sparkContext.setLogLevel("ERROR")
        bench.ensure_seq_table(spark)
        spark.stop()
    return bench.SEQ_CACHE


def write_schema(tmp: str) -> str:
    sys.path.insert(0, REPO)
    from validr_spark.datagen import sequences_schema
    path = os.path.join(tmp, "schema.json")
    with open(path, "w") as f:
        json.dump(sequences_schema().__schema__.to_primitive(), f)
    return path


def one_run(cpus: int, inp: str, schema: str, tmp: str) -> float:
    out = tempfile.mkdtemp(prefix=f"submit_{cpus}_", dir=tmp)
    env = dict(os.environ)
    env["SPARK_SUBMIT_FLAGS"] = (
        # 48g like the in-process protocol (bench.build_session): at the
        # larger level the allocation rate is 4x, and an undersized heap
        # GC-throttles exactly the level being measured
        "--driver-memory 48g "
        "--conf spark.local.dir=/dev/shm/spark-local "
        # same shuffle width and scan-split policy at both levels — the
        # ratio must measure parallelism, not a different plan
        "--conf spark.sql.shuffle.partitions=16 "
        "--conf spark.sql.files.maxPartitionBytes=8m "
        "--conf spark.sql.files.openCostInBytes=1m "
        "--conf spark.ui.enabled=false")
    cmd = ["bash", SUBMIT, f"local[{cpus}]", "validate",
           "--input", inp, "--schema", schema,
           "--part-col", "source", "--id-cols", "doc_id",
           "--parts-from-layout",
           "--violations", f"{out}/viol", "--manifest", f"{out}/manifest"]
    res = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=1800, env=env, cwd=REPO)
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-4000:])
    report = json.loads(
        [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1])
    assert report["n_parts_processed"] == report["n_parts_total"] > 0
    shutil.rmtree(out, ignore_errors=True)
    return float(report["seconds"])


def refresh_bench_md(section: str) -> None:
    text = open(BENCH_MD).read()
    if CUSTOM_MARK not in text:
        text += "\n" + CUSTOM_MARK + "\n"
    head, tail = text.split(CUSTOM_MARK, 1)
    # replace a previous instance of this section, else append
    pat = re.compile(re.escape(SECTION_HEAD) + r".*?(?=\n## |\Z)", re.S)
    if pat.search(tail):
        tail = pat.sub(section.rstrip() + "\n", tail)
    else:
        tail = tail.rstrip() + "\n\n" + section.rstrip() + "\n"
    with open(BENCH_MD, "w") as f:
        f.write(head + CUSTOM_MARK + tail)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    small, large = PAIR
    inp = ensure_input()
    tmp = tempfile.mkdtemp(prefix="submit_scaling_")
    schema = write_schema(tmp)

    # same-window box compute ceiling (process-based numpy burn, no
    # GIL/IO) — the launch-shape ratio is read AGAINST this: a shared box
    # whose raw compute only scales 2->8 at e.g. 0.8 caps any job there
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_scaling import cpu_ceiling_probe
    probe = cpu_ceiling_probe()
    probe_eff = round(
        probe[str(large)] / ((large / small) * probe[str(small)]), 3) \
        if str(small) in probe and str(large) in probe else None
    print(f"box ceiling {small}->{large}: {probe_eff}", file=sys.stderr)

    times: dict[int, list[float]] = {small: [], large: []}
    # one unmeasured warmup per level primes the OS page cache for the zip
    # + parquet footers (both levels equally)
    for cpus in (small, large):
        one_run(cpus, inp, schema, tmp)
    for i in range(runs):
        for cpus in (small, large):            # interleaved
            dt = one_run(cpus, inp, schema, tmp)
            times[cpus].append(dt)
            print(f"run {i + 1}/{runs} local[{cpus}]: {dt:.2f}s",
                  file=sys.stderr)

    factor = large / small    # float: 3->8 scales by 8/3, not 2
    best = {c: min(v) for c, v in times.items()}
    med = {c: statistics.median(v) for c, v in times.items()}
    eff_best = round(best[small] / (factor * best[large]), 3)
    eff_med = round(med[small] / (factor * med[large]), 3)
    result = {
        "pair": f"{small}->{large}",
        "best_small_s": round(best[small], 2),
        "best_large_s": round(best[large], 2),
        "median_small_s": round(med[small], 2),
        "median_large_s": round(med[large], 2),
        "efficiency_best": eff_best,
        "efficiency_median": eff_med,
        "box_ceiling_same_window": probe_eff,
        "efficiency_best_vs_ceiling": (round(eff_best / probe_eff, 3)
                                       if probe_eff else None),
        "runs": {str(c): [round(x, 2) for x in v] for c, v in times.items()},
    }
    print(json.dumps(result))

    rows_small = ", ".join(f"{x:.1f}" for x in times[small])
    rows_large = ", ".join(f"{x:.1f}" for x in times[large])
    section = f"""{SECTION_HEAD}

The north rule's run form is `spark-submit --py-files validr_spark.zip`
(tools/submit.sh).  The table below is the SAME
{int(os.environ['SPARK_GRAFT_SEQ_ROWS']) // 1000000}M-row,
source-partitioned sequences
validation (schema compile -> validate -> violations + manifest +
quarantine-free writes, `validr_spark.cli validate`) launched that way —
a fresh COLD spark-submit JVM per run — at local[{small}] and
local[{large}] on the identical tmpfs input, interleaved, job wall time
from the CLI report's `seconds` (JVM/session start excluded; Catalyst
planning, one-time codegen+JIT, validation, and all output writes
included — the CLI's phase_seconds attributes them).

| level | best s | median s | all runs (s) |
|---|---|---|---|
| local[{small}] (N) | {best[small]:.2f} | {med[small]:.2f} | [{rows_small}] |
| local[{large}] (4N) | {best[large]:.2f} | {med[large]:.2f} | [{rows_large}] |

Launch-shape scaling efficiency N->4N: **{eff_best} best / {eff_med}
median**, against a same-window box compute ceiling of
**{probe_eff}** (process-based numpy burn, no GIL/IO — raw compute on
this shared box only scales {small}->{large} that well while the
co-tenant is active).  Engine-vs-ceiling ratio:
**{round(eff_best / probe_eff, 3) if probe_eff else 'n/a'}**.  The
remaining gap vs the in-process primary protocol is the cold-JVM fixed
cost (one-time codegen + C2 JIT, PERF.md Findings 2/14) plus the
memory-bandwidth-heavier write path (violation explode + parquet
encode) — per-task time inflates {small}->{large} on a shared memory
bus in a way the steady-state, read-mostly primary job does not.  The
primary pairing table above remains the engine-scalability evidence;
this section evidences the END-TO-END packaged launch form at both
cluster sizes.
"""
    refresh_bench_md(section)


if __name__ == "__main__":
    main()
