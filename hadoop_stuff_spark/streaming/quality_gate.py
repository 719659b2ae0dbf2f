"""Streaming data-quality admission gate: the batch rule engine
(``operators/quality.enforce``) applied per micro-batch, routing every
record to a ``clean/`` or ``quarantine/`` landing area — what a
production ingest runs BETWEEN the source and the warehouse so malformed
records never land in certified tables (the reference crashed instead:
RecordFinderMap.java:28 raises on a bad split and takes the job down).

Replay safety: both sides use the batch-id idempotence pattern
(``stateful.exactly_once_parquet_sink``) — each micro-batch overwrites
its own ``batch_id=<n>`` directory, so the at-least-once window every
foreachBatch sink has (failure between write and checkpoint commit)
re-overwrites instead of duplicating. Quarantined rows keep every
original column plus ``failed_rules array<string>`` — nothing is
silently dropped, and the quarantine is re-processable once the
upstream defect is fixed.

Scale: the rule expressions are pure Catalyst conditional counts (one
pass per side over the micro-batch); state is zero — the gate is
stateless row routing, so it shards across any executor count with no
keyed shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def streaming_dq_gate(
    stream: DataFrame,
    rules: dict[str, Column],
    out_dir: str,
    checkpoint_dir: str,
):
    """Start the gate: returns the StreamingQuery. ``rules`` maps rule
    name -> boolean Column that is True when the row PASSES (the
    ``quality.check_rows`` contract)."""
    from hadoop_stuff_spark.operators.quality import enforce

    def route(batch: DataFrame, batch_id: int) -> None:
        clean, quarantine = enforce(batch, rules)
        clean.write.mode("overwrite").parquet(
            f"{out_dir}/clean/batch_id={batch_id}"
        )
        quarantine.write.mode("overwrite").parquet(
            f"{out_dir}/quarantine/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_gate_side(spark: SparkSession, out_dir: str, side: str) -> DataFrame:
    """Read one landing area (``clean`` / ``quarantine``) across all
    batch directories; the ``batch_id`` partition column is dropped so
    the result has exactly the routed schema."""
    if side not in ("clean", "quarantine"):
        raise ValueError(f"side must be 'clean' or 'quarantine', got {side!r}")
    return spark.read.parquet(f"{out_dir}/{side}").drop("batch_id")
