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


def file_report(spark: SparkSession, paths: str | list[str],
                count_rows: bool = True) -> DataFrame:
    """One row per physical parquet file under ``paths``: file name,
    bytes, and (optionally) row count.

    Sources with different schemas can be mixed (each path is scanned
    separately and only ``_metadata`` is kept, so the union always
    aligns).  With ``count_rows=False`` the scan touches footers and
    file listings only; with it, the count uses the normal vectorized
    parquet reader (columns are pruned to zero data fields).
    """
    if isinstance(paths, str):
        paths = [paths]
    parts = []
    for p in paths:
        d = spark.read.parquet(p).select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("bytes"))
        parts.append(d)
    u = reduce(DataFrame.unionAll, parts)
    if count_rows:
        return (u.groupBy("file", "bytes")
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .orderBy("file"))
    return u.dropDuplicates(["file"]).orderBy("file")


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
