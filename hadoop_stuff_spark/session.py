"""SparkSession factory tuned for this engine.

The reference hand-tunes physical execution per job (split sizes, map slots,
JVM reuse — DistributedGrep.java:104-110). Here the equivalent knobs are set
once, declaratively, and AQE re-plans at runtime:

- AQE on (coalesce post-shuffle partitions, skew-join splitting) — replaces
  the reference's manual split-size tuning (SURVEY.md P3).
- shuffle.partitions sized to the machine; AQE coalesces down when small.
- Arrow enabled so any pandas_udf path is batch-transferred (SURVEY.md P6:
  batch-at-a-time beats per-record — the reference measured this with
  StringEvaluationTest.java:53-73; pandas_udf is our version of the win).
- maxPartitionBytes 128 MiB — the reference's dfs.block.size sweet spot
  (IngestTest.java:66).

At 100 TB on a real cluster the same session conf holds; only
executor counts/memory (cluster-manager side) change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "") or (os.cpu_count() or 4)))
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "hadoop-stuff-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's tuned defaults.

    Safe to call repeatedly — Spark returns the existing session; conf that
    can only be set at JVM start (driver memory) is ignored on reuse.
    """
    cpus = _cpus()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(8, cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # Python DataSource pushdown (sources/pyds.py greplog): off by
        # default in Spark 4.1; enabling it is required for pushFilters
        # to reach the reader and harmless otherwise
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
