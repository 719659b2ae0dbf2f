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

Replay protocol (at-least-once delivery, converging). The one rule that
makes replays safe: **gating runs at most once per batch — a replay must
NEVER re-gate against stores that already absorbed this batch** (the
survivors would anti-join themselves away and an overwrite would erase
them from the corpus). Concretely:

- the raw delta and the survivor set land under ``batch_id=N`` dirs with
  mode=overwrite; Spark's ``_SUCCESS`` marker tells a replay whether the
  survivor landing COMPLETED.
- replay with a complete landing reuses the landed survivors verbatim
  (no re-gating, no overwrite) and only re-applies the store advances:
  the fingerprint append anti-joins the store first (no-op), the
  signature append can only duplicate rows — duplicate candidates
  collapse in the probe's ``dup_ids`` distinct, so correctness is
  unaffected and the cost is index bloat until the next rebuild.
- replay with an incomplete landing re-gates from scratch — safe,
  because the stores advance only AFTER a complete landing.
- a folded-batch manifest (atomic same-dir file replace) is the
  fast-path skip for fully-committed batches; it is an optimization on
  top of the rules above, not the safety mechanism.

Bootstrap is keyed on the store created LAST (the signature index), so a
crash at any point of the first batch replays back into the bootstrap
path instead of probing a store that does not exist.

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

        # bootstrap keys on the store created LAST — and on its _SUCCESS
        # marker, not the bare dir: a first-batch crash between the two
        # store builds (or mid-build) must replay back into bootstrap,
        # never into a probe of a store that does not exist or committed
        # only partially.
        bootstrap = not os.path.exists(os.path.join(sig_store, "_SUCCESS"))

        land_path = os.path.join(corpus_path, f"batch_id={batch_id}")
        landed_complete = os.path.exists(os.path.join(land_path, "_SUCCESS"))
        if landed_complete:
            # Replay after the landing committed: the stores MAY already
            # have absorbed this batch, so re-gating would anti-join the
            # survivors away and the overwrite below would erase them
            # (the data-loss window a code review reproduced). Reuse the
            # landed survivors verbatim and only re-apply the (idempotent
            # / bloat-bounded) store advances.
            survivors = spark.read.parquet(land_path)
        else:
            if bootstrap and not os.path.exists(fp_store):
                # An EMPTY fingerprint store is a plain parquet write
                # (readable), so the exact gate degenerates to the
                # within-batch collapse. The signature store CANNOT be
                # bootstrapped empty (a zero-row partitioned write leaves
                # no readable footer), so the near-dup gate is skipped
                # for this one batch — consistent with the documented
                # same-batch-near-dups-admitted semantics — and the index
                # is built from the landed survivors below.
                build_fingerprint_store(delta.limit(0), fp_store, text_col)
            novel = novel_against_fingerprints(spark, delta, fp_store, text_col)
            if not bootstrap:
                novel = novel_against_signatures(
                    spark, novel, sig_store, text_col, threshold
                )
            novel.write.mode("overwrite").parquet(land_path)
            survivors = spark.read.parquet(land_path)

        update_fingerprint_store(spark, survivors, fp_store, text_col)
        if bootstrap:
            build_signature_store(survivors, sig_store, text_col)
        else:
            update_signature_store(survivors, sig_store, text_col)
        _commit(work_dir, _folded(work_dir) | {bid})

    return sink
