"""Idempotent partition backfill — reprocess one partition (day/host/…)
of a partitioned table without touching its siblings.

The pipeline op every production table needs: when day D's input is
corrected, rerun D and atomically replace ONLY `part=D` directories.
Spark's dynamic partition-overwrite mode does exactly this; the trap is
that the default ("static") mode silently DELETES every other partition
on overwrite — so this module pins the dynamic mode per-write (scoped,
not session-global) and the test proves sibling partitions survive
byte-identically.

Reference provenance: the reference's ingest lays out date/host
partitions (IngestTest.java:58,68) but can only ever append; replacing a
bad day meant manual HDFS surgery. This is the engine-native fix.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


@contextmanager
def _scoped_conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Overwrite ONLY the partitions present in ``df`` (dynamic mode),
    leaving all other partition directories of the table untouched."""
    spark = df.sparkSession
    with _scoped_conf(spark, _MODE_KEY, "dynamic"):
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def backfill_partition(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    partition_values: dict[str, object],
) -> None:
    """Guard-railed single-partition backfill: asserts ``df`` contains
    exactly the partition being replaced (a mis-filtered backfill frame
    would otherwise silently replace MORE partitions), then overwrites it
    in place."""
    from pyspark.sql import functions as F

    for col, val in partition_values.items():
        distinct = [r[0] for r in df.select(col).distinct().collect()]
        if distinct != [val]:
            raise ValueError(
                f"backfill frame has {col} values {distinct!r}, expected [{val!r}]"
            )
    cond = None
    for col, val in partition_values.items():
        c = F.col(col) == F.lit(val)
        cond = c if cond is None else cond & c
    overwrite_partitions(df.filter(cond), path, partition_cols)
