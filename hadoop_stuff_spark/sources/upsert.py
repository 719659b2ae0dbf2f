"""Keyed partition-scoped upsert — MERGE-INTO semantics on plain parquet,
at O(affected partitions) cost.

The op every incremental pipeline eventually needs: land a delta where
existing keys are REPLACED (late corrections) and new keys INSERTED,
without rewriting the table. Table formats do this with metadata; on
plain parquet the honest minimal implementation is copy-on-write scoped
to the delta's partitions:

1. the delta's distinct partition values (tiny — broadcast) select which
   partitions participate; every other partition is never read or
   written;
2. within those partitions, current rows whose key appears in the delta
   are dropped (left-anti on the key), the delta is unioned in;
3. the merged rows are eagerly materialized (localCheckpoint) — Spark
   refuses to overwrite a path it is still lazily reading — then written
   with dynamic partition-overwrite (`backfill.overwrite_partitions`),
   which replaces exactly the participating partition directories.

Scale shape: read + shuffle + rewrite are all proportional to the
AFFECTED partitions, never the table; the key anti-join shuffles only
those partitions' rows on the key (or broadcasts the delta when small —
Spark picks). The materialization buffers only the affected partitions'
merged rows. Crash mid-write degrades like any overwrite of those
partitions — rerun the upsert (it is idempotent for the same delta);
unaffected partitions are untouched at every instant. A metastore/table
format replaces step 3's directory swap at real scale; steps 1-2 are
identical there.

Reference provenance: the reference could only append
(IngestTest.java:58,68); correcting a record meant manual HDFS surgery.
SCD2 (`operators/scd.py`) keeps full history instead of replacing —
this module is the "current-state table" counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.sources.backfill import overwrite_partitions


def upsert_by_key(
    spark: SparkSession,
    target_path: str,
    delta: DataFrame,
    keys: list[str],
    partition_cols: list[str],
) -> dict:
    """MERGE ``delta`` into the partitioned parquet table at
    ``target_path``: rows matching on ``keys`` are replaced, new keys
    inserted, and ONLY partitions present in the delta are read or
    rewritten. Returns a small stats dict (partitions touched, rows
    replaced/inserted) — all bounded control-plane numbers."""
    if not keys or not partition_cols:
        raise ValueError("upsert_by_key needs key columns and partition columns")
    # MERGE semantics are undefined when the source matches a target row
    # twice (ANSI MERGE errors; so do we). Bounded guard: one job, at
    # most one driver row.
    dup = (
        delta.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"delta contains duplicate key {tuple(dup[0][k] for k in keys)!r} "
            f"for keys {keys} — deduplicate the delta first (MERGE semantics "
            "are undefined for multi-matching sources)"
        )
    parts = delta.select(*partition_cols).distinct()
    current = spark.read.parquet(target_path).join(
        F.broadcast(parts), partition_cols, "left_semi"
    )
    survivors = current.join(delta.select(*keys), keys, "left_anti")
    merged = survivors.unionByName(delta).localCheckpoint(eager=True)

    n_parts = parts.count()
    n_current = current.count()
    n_delta = delta.count()
    n_survivors = merged.count() - n_delta
    replaced = n_current - n_survivors
    overwrite_partitions(merged, target_path, partition_cols)
    return {
        "partitions_touched": n_parts,
        "rows_replaced": replaced,
        "rows_inserted": n_delta - replaced,
    }
