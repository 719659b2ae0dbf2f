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
identical there. Partition-scoped also means keys must be STABLE within
their partition columns (see `upsert_by_key` — `strict=True` verifies).

Reference provenance: the reference could only append
(IngestTest.java:58,68); correcting a record meant manual HDFS surgery.
SCD2 (`operators/scd.py`) keeps full history instead of replacing —
this module is the "current-state table" counterpart.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.sources.backfill import overwrite_partitions


def upsert_by_key(
    spark: SparkSession,
    target_path: str,
    delta: DataFrame,
    keys: list[str],
    partition_cols: list[str],
    strict: bool = False,
) -> dict:
    """MERGE ``delta`` into the partitioned parquet table at
    ``target_path``: rows matching on ``keys`` are replaced, new keys
    inserted, and ONLY partitions present in the delta are read or
    rewritten. Returns a small stats dict (partitions touched, rows
    replaced/inserted) — all bounded control-plane numbers.

    PRECONDITION — keys must be stable within their partition columns:
    because only the delta's partitions are read, a correction that
    MOVES a key to a different partition value would leave the stale
    row behind in its old partition, creating a duplicate key. Pass
    ``strict=True`` to verify: a key-and-partition-column scan of the
    WHOLE table (column-pruned, no payload bytes) anti-checks every
    delta key's existing partition and raises on any mover before a
    single byte is written. Costs one extra table-wide scan — O(table
    keys), not O(table bytes) — so default off for append-mostly
    pipelines that guarantee stability by construction (e.g. the
    partition value is derived from the key)."""
    if not keys or not partition_cols:
        raise ValueError("upsert_by_key needs key columns and partition columns")
    # NULL merge keys are undefined for MERGE (ANSI equi-match never
    # matches NULL): a NULL-key delta row would evade both the replace
    # anti-join and the strict mover check and silently duplicate on
    # every merge (ADVICE r5 low). Refuse upfront — bounded guard, one
    # job, at most one driver row.
    null_key = (
        delta.filter(
            functools.reduce(lambda a, b: a | b, [F.col(k).isNull() for k in keys])
        )
        .limit(1)
        .collect()
    )
    if null_key:
        raise ValueError(
            f"delta contains a NULL in key columns {keys} "
            f"(row {null_key[0].asDict()!r}) — NULL merge keys are undefined "
            "for MERGE; filter or impute them first"
        )
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
    if strict:
        # Detect keys moving partitions: existing (key → partition)
        # pairs that match a delta key but disagree on partition value.
        existing = spark.read.parquet(target_path).select(
            *keys, *partition_cols
        )
        renamed = delta.select(
            *keys,
            *[F.col(c).alias(f"__delta_{c}") for c in partition_cols],
        )
        mover = (
            existing.join(F.broadcast(renamed), keys)
            .filter(
                ~functools.reduce(
                    lambda a, b: a & b,
                    [
                        F.col(c).eqNullSafe(F.col(f"__delta_{c}"))
                        for c in partition_cols
                    ],
                )
            )
            .limit(1)
            .collect()
        )
        if mover:
            r = mover[0]
            raise ValueError(
                f"strict upsert refused: key {tuple(r[k] for k in keys)!r} "
                f"exists under partition "
                f"{tuple(r[c] for c in partition_cols)!r} but the delta "
                f"places it in "
                f"{tuple(r[f'__delta_{c}'] for c in partition_cols)!r} — "
                "partition-scoped upsert would strand the old row; delete "
                "it from its old partition first (keys must be stable "
                "within their partition columns)"
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
