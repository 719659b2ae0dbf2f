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

from pyspark.sql import DataFrame


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Overwrite ONLY the partitions present in ``df`` (dynamic mode),
    leaving all other partition directories of the table untouched.

    The dynamic mode is set as a per-write DataFrameWriter option
    (takes precedence over the session conf in Spark 3+), so concurrent
    writes in the same session never observe a mutated global conf."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def backfill_partition(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    partition_values: dict[str, object],
) -> None:
    """Guard-railed single-partition backfill: asserts ``df`` contains
    exactly the partition being replaced (a mis-filtered backfill frame
    would otherwise silently replace MORE partitions), then overwrites it
    in place.

    The guard is bounded: one job, at most 2 driver rows — a
    high-cardinality mis-scoped frame never floods the driver with its
    full distinct set."""
    from pyspark.sql import functions as F

    cols = list(partition_values)
    offending = [
        tuple(r)
        for r in df.select(*cols).distinct().limit(2).collect()
    ]
    expected = tuple(partition_values[c] for c in cols)
    if offending != [expected]:
        raise ValueError(
            f"backfill frame has partition values {offending!r} for {cols}, "
            f"expected exactly [{expected!r}]"
        )
    cond = None
    for col, val in partition_values.items():
        c = F.col(col) == F.lit(val)
        cond = c if cond is None else cond & c
    overwrite_partitions(df.filter(cond), path, partition_cols)
