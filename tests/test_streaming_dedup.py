"""Streaming novelty-gated ingestion: the streamed corpus must equal the
sequential batch-mode application of the same dedup gates, and replays
must not change it."""

import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.dedup import streaming_dedup_ingest_sink
import pytest

# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow

BASE = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten"),
    (3, "red orange yellow green blue indigo violet pink brown black"),
]
BATCH2 = [
    (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup of 1
    (5, "one two three four five six seven eight nine eleven"),  # near dup of 2
    (6, "north south east west up down left right front back"),  # novel
]
BATCH3 = [
    (7, "north south east west up down left right front back"),  # exact dup of 6
    (8, "sun moon stars comet nebula galaxy quasar pulsar nova void"),  # novel
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_stream(spark, tmp_path, batches):
    corpus = str(tmp_path / "corpus")
    fp = str(tmp_path / "fp_store")
    sig = str(tmp_path / "sig_store")
    work = str(tmp_path / "work")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    sink = streaming_dedup_ingest_sink(corpus, fp, sig, work)
    for i, rows in enumerate(batches):
        _df(spark, rows).write.parquet(os.path.join(src, f"slice{i}"))
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(os.path.join(src, "slice*"))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return corpus, fp, sig, work, sink


def _batch_oracle(spark, tmp_path, batches):
    """Sequentially apply the SAME batch primitives the sink composes."""
    from hadoop_stuff_spark.operators.incremental import (
        build_fingerprint_store,
        build_signature_store,
        novel_against_fingerprints,
        novel_against_signatures,
        update_fingerprint_store,
        update_signature_store,
    )

    fp = str(tmp_path / "o_fp")
    sig = str(tmp_path / "o_sig")
    kept = []
    for i, rows in enumerate(batches):
        d = _df(spark, rows)
        if i == 0:
            build_fingerprint_store(d.limit(0), fp)
            nov = novel_against_fingerprints(spark, d, fp)
            nov = spark.createDataFrame(nov.collect(), d.schema)
            update_fingerprint_store(spark, nov, fp)
            build_signature_store(nov, sig)
        else:
            nov = novel_against_fingerprints(spark, d, fp)
            nov = novel_against_signatures(spark, nov, sig)
            nov = spark.createDataFrame(nov.collect(), d.schema)
            update_fingerprint_store(spark, nov, fp)
            update_signature_store(nov, sig)
        kept += [(r.doc_id, r.text) for r in nov.collect()]
    return sorted(kept)


def test_streamed_corpus_equals_sequential_batch_gating(spark, tmp_path):
    batches = [BASE, BATCH2, BATCH3]
    corpus, fp, sig, work, _ = _run_stream(spark, tmp_path, batches)
    got = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(corpus).select("doc_id", "text").collect()
    )
    exp = _batch_oracle(spark, tmp_path, batches)
    assert got == exp
    # the planted fates, spelled out: exact dup 4 and near dup 5 dropped,
    # exact dup 7 dropped, novels 6 and 8 kept
    kept_ids = {d for d, _ in got}
    assert kept_ids == {1, 2, 3, 6, 8}


def test_streaming_dedup_replay_is_noop(spark, tmp_path):
    batches = [BASE, BATCH2]
    corpus, fp, sig, work, sink = _run_stream(spark, tmp_path, batches)
    before = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(corpus).select("doc_id", "text").collect()
    )
    n_fp = spark.read.parquet(fp).count()
    n_sig = spark.read.parquet(sig).count()
    # replay batch 1 (already folded): manifest skip, nothing changes
    sink(_df(spark, batches[1]), 1)
    after = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(corpus).select("doc_id", "text").collect()
    )
    assert after == before
    assert spark.read.parquet(fp).count() == n_fp
    assert spark.read.parquet(sig).count() == n_sig


def test_replay_after_store_advance_does_not_lose_documents(spark, tmp_path):
    """The reproduced crash window: stores advanced, manifest commit lost.
    The replay must reuse the landed survivors (the _SUCCESS shortcut) —
    re-gating against the advanced stores would anti-join the survivors
    away and overwrite the landed batch with an empty frame."""
    import json

    batches = [BASE, BATCH2]
    corpus, fp, sig, work, sink = _run_stream(spark, tmp_path, batches)
    before = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(corpus).select("doc_id", "text").collect()
    )
    # simulate the crash: batch 1 fully applied but its manifest entry lost
    manifest = os.path.join(work, "_FOLDED")
    folded = json.load(open(manifest))
    folded["folded"].remove("1")
    json.dump(folded, open(manifest, "w"))

    sink(_df(spark, batches[1]), 1)

    after = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(corpus).select("doc_id", "text").collect()
    )
    assert after == before  # nothing lost, nothing re-gated away


def test_bootstrap_crash_between_store_builds_recovers(spark, tmp_path):
    """The reproduced wedge: first batch crashed after the fingerprint
    store was built but before the signature store existed. Bootstrap
    keys on the signature store's _SUCCESS marker, so the replay re-enters
    the bootstrap path instead of probing a nonexistent store forever."""
    from hadoop_stuff_spark.operators.incremental import build_fingerprint_store

    corpus = str(tmp_path / "corpus")
    fp = str(tmp_path / "fp_store")
    sig = str(tmp_path / "sig_store")
    work = str(tmp_path / "work")
    # crashed first attempt left only the (empty) fingerprint store
    build_fingerprint_store(_df(spark, BASE).limit(0), fp)
    assert not os.path.exists(sig)

    sink = streaming_dedup_ingest_sink(corpus, fp, sig, work)
    sink(_df(spark, BASE), 0)  # replay of the first batch

    kept = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 3}
    assert os.path.exists(os.path.join(sig, "_SUCCESS"))
