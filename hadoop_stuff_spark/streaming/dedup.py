"""Streaming novelty-gated corpus ingestion: the continuous form of the
training-data dedup front door. Each micro-batch of documents is gated
against the PERSISTED dedup stores — exact content fingerprints, then the
banded MinHash signature index — and only novel documents land in the
corpus; both stores are advanced by exactly the landed survivors.

Composition of certified batch pieces (operators/incremental.py):
``novel_against_fingerprints`` (left-anti on the 16-byte fingerprint,
within-batch exact dups collapsed to the min-id representative) →
``novel_against_signatures`` (banded probe joins only the (band, bucket)
partitions the batch touches; signature-agreement estimate on candidates
only) → per-batch survivor landing → ``update_*_store`` appends.

Replay protocol (at-least-once delivery, converging):

- the raw delta and the survivor set land under ``batch_id=N`` dirs with
  mode=overwrite — re-landing is byte-idempotent.
- a folded-batch manifest (atomic same-dir replace, the
  incremental-rollup pointer protocol) skips fully-applied batches.
- the crash window between the store appends and the manifest commit is
  BOUNDED AND SAFE: a replayed fingerprint append is a no-op (the update
  anti-joins the store first), and a replayed signature append can only
  duplicate signature rows — duplicate candidates collapse in the
  novelty probe's `dup_ids` distinct, so correctness is unaffected and
  the cost is index bloat until the next rebuild. This is why the stores
  are advanced from the LANDED survivor files, not the in-flight frame:
  what the index says exists is exactly what the corpus dir holds.

Semantics note (matches the batch day-2 path): near-dup gating is
against the STORE — two near-duplicates arriving in the SAME micro-batch
both survive and both enter the index (every later batch is gated
against both). Exact dups within a batch are collapsed.

At scale: the fingerprint anti-join is a hash join on 16-byte keys; the
signature probe prunes to touched (band, bucket) partitions; per batch
nothing scans the corpus itself.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _manifest_path(work_dir: str) -> str:
    return os.path.join(work_dir, "_FOLDED")


def _folded(work_dir: str) -> set[str]:
    p = _manifest_path(work_dir)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f)["folded"])


def _commit(work_dir: str, folded: set[str]) -> None:
    p = _manifest_path(work_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"folded": sorted(folded)}, f)
    os.replace(tmp, p)


def streaming_dedup_ingest_sink(
    corpus_path: str,
    fp_store: str,
    sig_store: str,
    work_dir: str,
    text_col: str = "text",
    threshold: float = 0.4,
):
    """foreachBatch function landing only novel documents at
    ``corpus_path`` (one ``batch_id=N`` dir per batch; read the corpus
    with ``spark.read.parquet(corpus_path)``). Stores are bootstrapped
    from the first batch if absent."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        from hadoop_stuff_spark.operators.incremental import (
            build_fingerprint_store,
            build_signature_store,
            novel_against_fingerprints,
            novel_against_signatures,
            update_fingerprint_store,
            update_signature_store,
        )

        spark = batch.sparkSession
        os.makedirs(work_dir, exist_ok=True)
        delta_path = os.path.join(work_dir, "deltas", f"batch_id={batch_id}")
        batch.write.mode("overwrite").parquet(delta_path)
        bid = str(batch_id)
        if bid in _folded(work_dir):
            return
        delta = spark.read.parquet(delta_path)
        if delta.isEmpty():
            # nothing to gate or land; folding an empty batch keeps the
            # bootstrap path (which builds stores from survivors) for a
            # batch that actually carries rows.
            _commit(work_dir, _folded(work_dir) | {bid})
            return

        bootstrap = not os.path.exists(fp_store)
        if bootstrap:
            # First batch: an EMPTY fingerprint store is a plain parquet
            # write (readable), so the exact gate degenerates to the
            # within-batch collapse. The signature store CANNOT be
            # bootstrapped empty (a zero-row partitioned write leaves no
            # readable footer), so the near-dup gate is skipped this one
            # batch — consistent with the documented semantics that
            # same-batch near-dups are admitted — and the index is built
            # from the landed survivors below.
            build_fingerprint_store(delta.limit(0), fp_store, text_col)
        novel = novel_against_fingerprints(spark, delta, fp_store, text_col)
        if not bootstrap:
            novel = novel_against_signatures(
                spark, novel, sig_store, text_col, threshold
            )

        land_path = os.path.join(corpus_path, f"batch_id={batch_id}")
        novel.write.mode("overwrite").parquet(land_path)
        survivors = spark.read.parquet(land_path)
        update_fingerprint_store(spark, survivors, fp_store, text_col)
        if bootstrap:
            build_signature_store(survivors, sig_store, text_col)
        else:
            update_signature_store(survivors, sig_store, text_col)
        _commit(work_dir, _folded(work_dir) | {bid})

    return sink
