"""Small-file compaction — the table-maintenance op every long-running
100 TB pipeline needs (streaming sinks and per-device ingest write many
small files; the reference's 26-writer ingest, TailFTest.java:326-377,
produced exactly this sprawl — one file per writer per run, never merged).

Strategy: size the output file count from the actual input bytes
(``target_file_size`` ≈ the HDFS-block / row-group sweet spot the
reference swept manually, 128-512 MiB — IngestTest.java:66), then rewrite
with a round-robin `repartition(n)`. Columns and rows are preserved
byte-for-byte; only the file layout changes. The rewrite is a full
scan+write — schedule it off the hot path (that tradeoff is inherent:
compaction trades one sequential rewrite for every future scan opening
1000× fewer files)."""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def plan_compaction(
    spark: SparkSession, path: str, target_file_size: int = 128 * 1024 * 1024
) -> tuple[int, int, int]:
    """Inspect a parquet directory: (n_files, total_bytes, target_n_files)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    n_files = 0
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(".parquet"):
            n_files += 1
            total += status.getLen()
    target = max(1, math.ceil(total / target_file_size))
    return n_files, total, target


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_size: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``path`` into ``out_path`` with ~``target_file_size`` files.
    Returns the output file count. (Writes to a NEW directory — atomic
    swap/rename is the caller's job, matching how table formats stage
    compactions.)"""
    _, _, target = plan_compaction(spark, path, target_file_size)
    df = spark.read.parquet(path)
    df.repartition(target).write.mode("error").parquet(out_path)
    return target
