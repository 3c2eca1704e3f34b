"""Physical-layout forensics for parquet datasets: the small-file report.

At 100 TB the #1 silent performance killer is not the query plan — it is
the layout underneath it: a table written by 10,000 tasks × 365 days ends
up as millions of KB-sized files, and every scan pays file-open +
footer-parse + scheduler overhead per file while splits stop coalescing.
These operators read ONLY Spark's hidden ``_metadata`` scan column (file
path/size — no data pages are decoded for the layout columns) and report
the fragmentation before it becomes a six-hour scan.

No counterpart in guyskk/validr (single-value validation only); this is
the storage-ops layer of the distributed brief.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["file_report", "small_file_advice"]


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(uri, bytes) for every data file under ``path``, via the Hadoop
    FileSystem API — driver-side metadata listing (the same O(files)
    cost any compaction tool pays), works for local and HDFS-style URIs.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        base = name.rsplit("/", 1)[-1]
        if base.startswith("_") or base.startswith("."):
            continue            # _SUCCESS, _metadata, hidden files
        out.append((name, int(st.getLen())))
    return out


def file_report(spark: SparkSession, paths: str | list[str],
                count_rows: bool = True) -> DataFrame:
    """One row per physical parquet file under ``paths``: file name,
    bytes, and (optionally) row count.

    The file LIST comes from a filesystem listing, not from scan rows —
    a zero-row part file (empty partitions, heavily-filtered writes:
    exactly the fragmentation this tool hunts) produces no ``_metadata``
    rows and would silently vanish from a scan-derived report; here it
    appears with ``n_rows = 0``.  Sources with different schemas can be
    mixed.  ``count_rows=True`` adds per-file counts from a
    zero-data-column scan joined back on the file URI.
    """
    if isinstance(paths, str):
        paths = [paths]
    listed = [f for p in paths for f in _list_files(spark, p)]
    base = spark.createDataFrame(listed, "file string, bytes long")
    if not count_rows:
        return base.orderBy("file")
    parts = []
    for p in paths:
        d = spark.read.parquet(p).select(
            F.col("_metadata.file_path").alias("file"))
        parts.append(d)
    u = reduce(DataFrame.unionAll, parts)
    counts = u.groupBy("file").agg(F.count(F.lit(1)).alias("n_rows"))
    return (base.join(counts, "file", "left")
            .withColumn("n_rows", F.coalesce("n_rows", F.lit(0)))
            .orderBy("file"))


def small_file_advice(spark: SparkSession, paths: str | list[str],
                      target_bytes: int = 128 << 20) -> DataFrame:
    """One-row layout summary + compaction advice for a parquet dataset:

    n_files, total_bytes, avg/min/max file bytes, ``small_files`` (files
    under half the target), ``small_frac``, and ``advised_files`` =
    ``ceil(total_bytes / target_bytes)`` — the file count a compaction
    rewrite (``df.repartition(advised_files).write...``, or
    ``repartition_by_size`` for byte-true packing) should produce.

    Rule of thumb encoded here: files should sit near the scan split
    size (``spark.sql.files.maxPartitionBytes``, default 128 MB) — far
    smaller multiplies per-file overhead, far larger can't split across
    tasks for non-splittable codecs.
    """
    rep = file_report(spark, paths, count_rows=False)
    half = target_bytes // 2
    return rep.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.min("bytes").alias("min_bytes"),
        F.max("bytes").alias("max_bytes"),
        F.round(F.avg("bytes"), 1).alias("avg_bytes"),
        F.sum((F.col("bytes") < half).cast("long")).alias("small_files"),
        F.round(F.avg((F.col("bytes") < half).cast("double")), 6)
        .alias("small_frac"),
        F.ceil(F.sum("bytes") / F.lit(float(target_bytes)))
        .alias("advised_files"))
