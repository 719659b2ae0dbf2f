"""Streaming maintenance of the persisted IVF ANN index: as embedding
rows stream in (the "online vector ingestion" half of a RAG/retrieval
deployment), each micro-batch is encoded against the index's SAVED
centroids and merged into the cell-partitioned corpus — the streaming
closure of the batch day-2 path (`similarity.append_to_ivf_index`).

Replay safety comes from key semantics, not fold markers (the
`streaming_upsert_sink` argument, matview.py): the batch lands
idempotently by batch_id, and the merge is `upsert_by_key` on vec_id —
re-applying the SAME delta is a no-op because its keys already carry its
values, so at-least-once delivery converges. Only the cell partitions the
batch touches are rewritten (O(|batch| cells), never the index).

Precondition (documented, same as every upsert consumer): a re-delivered
vec_id carries the SAME embedding — content-addressed or immutable vector
ids, the normal contract for an embedding store. A vec_id re-sent with a
DIFFERENT embedding could land in a different cell and would duplicate
across cells (`upsert_by_key`'s partition-stability precondition,
sources/upsert.py — its strict mode exists for audits of exactly this).

The quantizer stays FIXED across appends (the saved-centroid encoder) —
drift is a rebuild decision driven by recall tests, never something a
micro-batch does implicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def streaming_ivf_append_sink(index_path: str, work_dir: str):
    """foreachBatch function appending streamed (vec_id, embedding) rows
    into the IVF index at ``index_path`` (built by
    `similarity.build_ivf_index`). Use with
    ``writeStream.foreachBatch(sink)``."""

    encoder_cache: list = []

    def sink(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from hadoop_stuff_spark.operators.similarity import saved_centroid_encoder
        from hadoop_stuff_spark.sources.upsert import upsert_by_key

        spark = batch.sparkSession
        delta_path = os.path.join(work_dir, "deltas", f"batch_id={batch_id}")
        batch.write.mode("overwrite").parquet(delta_path)
        delta = spark.read.parquet(delta_path).select("vec_id", "embedding")
        # upsert_by_key (correctly) refuses NULL and duplicate merge keys,
        # and a poison batch would wedge the stream on infinite retries:
        # NULL vec_ids are not addressable (dropped), and within-batch
        # duplicates collapse to one row — well-defined because the
        # module contract says a re-delivered vec_id carries the SAME
        # embedding, so any pick is identical content.
        delta = delta.filter(F.col("vec_id").isNotNull()).dropDuplicates(["vec_id"])
        if delta.isEmpty():
            return
        # the quantizer is FIXED for the index's lifetime (module
        # docstring), so the centroid read + driver collect happens once
        # per sink, not once per micro-batch.
        if not encoder_cache:
            encoder_cache.append(saved_centroid_encoder(spark, index_path))
        cell_of = encoder_cache[0]
        encoded = delta.select(
            "vec_id", "embedding", cell_of("embedding").alias("cell")
        )
        upsert_by_key(
            spark,
            f"{index_path}/corpus",
            encoded,
            keys=["vec_id"],
            partition_cols=["cell"],
        )

    return sink
