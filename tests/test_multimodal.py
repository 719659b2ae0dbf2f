"""Multimodal plumbing tests (N4): binary columns through mapInPandas."""

import math

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_SIZE,
    extract_media_features,
    resize_media,
    sample_frames,
    synthesize_blobs,
)


def test_blob_synthesis_schema(spark, sf_dir):
    blobs = synthesize_blobs(spark, sf_dir)
    assert blobs.schema.simpleString() == (
        "struct<doc_id:bigint,payload:binary,media_type:string,n_bytes:bigint>"
    )


def test_feature_extraction_shapes(spark, sf_dir):
    blobs = synthesize_blobs(spark, sf_dir)
    feats = extract_media_features(blobs)
    rows = feats.collect()
    assert len(rows) == blobs.count()
    for r in rows[:20]:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-6  # histogram normalized
        assert r.width is not None and r.height is not None


def test_resize_fixed_output_size(spark, sf_dir):
    """Resize stage: every output payload is exactly width*height bytes,
    deterministic in the input, schema carries the new dims."""
    blobs = synthesize_blobs(spark, sf_dir)
    out = resize_media(blobs, width=16, height=8)
    rows = out.collect()
    assert len(rows) == blobs.count()
    for r in rows[:25]:
        assert len(r.payload) == 16 * 8
        assert (r.width, r.height) == (16, 8)


def test_frame_sample_counts_and_reassembly(spark, sf_dir):
    """Frame sampling: every_n=1 frames concatenate back to the original
    payload (lossless cut); every_n=4 keeps ceil(n_frames/4) per doc."""
    blobs = synthesize_blobs(spark, sf_dir).limit(50)
    src = {r.doc_id: bytes(r.payload) for r in blobs.collect()}

    all_frames = sample_frames(blobs, every_n=1).collect()
    rebuilt = {}
    for r in sorted(all_frames, key=lambda r: (r.doc_id, r.frame_idx)):
        rebuilt[r.doc_id] = rebuilt.get(r.doc_id, b"") + bytes(r.frame)
    assert rebuilt == src

    sampled = (
        sample_frames(blobs, every_n=4)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r.doc_id: r.n for r in sampled}
    for doc_id, payload in src.items():
        n_frames = math.ceil(len(payload) / FRAME_SIZE)
        want = math.ceil(n_frames / 4) if n_frames else 0
        if want:
            assert got[doc_id] == want
        else:
            assert doc_id not in got


def test_feature_extraction_deterministic(spark, sf_dir):
    blobs = synthesize_blobs(spark, sf_dir)
    a = {r.doc_id: tuple(r.feature) for r in extract_media_features(blobs).collect()}
    b = {r.doc_id: tuple(r.feature) for r in extract_media_features(blobs).collect()}
    assert a == b


def test_arrow_batch_rows_bounds_python_batches(spark, sf_dir):
    """arrow_batch_rows caps the rows per Arrow batch handed to the Python
    worker (the per-worker memory bound for MB-scale payloads), without
    changing results — and restores the previous session conf on exit
    (ADVICE r1: no hidden session-wide mutation)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from hadoop_stuff_spark.operators.multimodal import arrow_batch_rows

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf_key, None)

    blobs = synthesize_blobs(spark, sf_dir).coalesce(1)  # one partition
    baseline = {
        (r.doc_id, tuple(r.feature)) for r in extract_media_features(blobs).collect()
    }

    def batch_sizes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"batch_len": [len(pdf)]})

    with arrow_batch_rows(spark, 50):
        sizes = [
            r.batch_len
            for r in blobs.mapInPandas(
                batch_sizes, StructType([StructField("batch_len", IntegerType())])
            ).collect()
        ]
        bounded = {
            (r.doc_id, tuple(r.feature))
            for r in extract_media_features(blobs).collect()
        }
    assert max(sizes) <= 50, sizes
    assert sum(sizes) == 500  # every row delivered exactly once
    assert bounded == baseline
    # scoping: previous session value restored exactly
    assert spark.conf.get(conf_key, None) == prev


def test_audio_stats_against_numpy(spark, sf_dir):
    """Waveform statistics from the audio stage match a local numpy
    recomputation on the same bytes."""
    import numpy as np

    from hadoop_stuff_spark.operators.multimodal import extract_audio_stats

    blobs = synthesize_blobs(spark, sf_dir)
    sample = {r.doc_id: bytes(r.payload) for r in blobs.limit(20).collect()}
    got = {
        r.doc_id: r
        for r in extract_audio_stats(blobs).filter(
            F.col("doc_id").isin(list(sample))
        ).collect()
    }
    for doc_id, payload in sample.items():
        wave = (np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        r = got[doc_id]
        assert r.n_samples == len(payload)
        assert abs(r.rms - float(np.sqrt((wave**2).mean()))) < 1e-5
        assert abs(r.peak - float(np.abs(wave).max())) < 1e-6


def test_media_ahash_near_dups_find_seeded_pairs(spark, tmp_path):
    """Byte-identical payloads pair at hamming 0; a lightly-corrupted copy
    pairs within the threshold; unrelated payloads do not pair."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.dedup import banded_hamming_pairs
    from hadoop_stuff_spark.operators.multimodal import media_ahash

    # ramp "image": 64 segments with distinct means (a uniform pattern
    # would hash to 0 for everything — no signal)
    base = bytes((i >> 6) & 0xFF for i in range(16384))
    corrupt = bytearray(base)
    corrupt[0:512] = b"\xff" * 512         # brighten 2 of 64 segments
    other = bytes(255 - ((i >> 6) & 0xFF) for i in range(16384))  # inverted ramp
    rows = [
        (1, bytearray(base)),
        (2, bytearray(base)),              # exact dup of 1
        (3, corrupt),                      # near dup of 1
        (4, bytearray(other)),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = media_ahash(media)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in banded_hamming_pairs(hashes, "doc_id", "ahash", max_hamming=8)
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming"
        )
        .collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 8
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_media_near_dups_runs_on_testdata(spark, sf_dir):
    from hadoop_stuff_spark.operators.multimodal import media_near_dups

    out = media_near_dups(spark, sf_dir, max_hamming=4)
    assert out.columns == ["doc_a", "doc_b", "hamming"]
    assert out.count() >= 0
