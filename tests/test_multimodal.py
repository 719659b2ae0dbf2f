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


# ---------------------------------------------------------------------------
# real byte-level decode (functions/media.py) — golden-byte fixtures


def test_parse_wav_golden_bytes():
    """A handcrafted PCM WAV decodes to its exact container metadata and
    real sample statistics — no audio library involved."""
    import numpy as np

    from hadoop_stuff_spark.functions.media import is_wav, make_wav, parse_wav

    t = np.arange(8000) / 8000.0
    wave = 0.5 * np.sin(2 * np.pi * 440 * t)  # 1 s of A440 at half scale
    payload = make_wav(wave, sample_rate=8000)
    assert is_wav(payload)
    info = parse_wav(payload)
    assert info.sample_rate == 8000
    assert info.channels == 1
    assert info.bits == 16
    assert info.n_samples == 8000
    assert abs(info.duration_s - 1.0) < 1e-9
    # sine RMS = amp/sqrt(2); 16-bit quantization error << 1e-3
    assert abs(float(np.sqrt((info.waveform**2).mean())) - 0.5 / np.sqrt(2)) < 1e-3


def test_parse_wav_skips_foreign_chunks_and_handles_8bit_stereo():
    """Chunk walk must skip LIST/other chunks, and 8-bit stereo PCM must
    average to mono at the right frame count."""
    import struct

    import numpy as np

    from hadoop_stuff_spark.functions.media import parse_wav

    # 4 frames of 8-bit stereo: L=128+d, R=128-d → mono mean exactly 128 (0.0)
    data = bytes([138, 118, 148, 108, 158, 98, 168, 88])
    fmt = struct.pack("<HHIIHH", 1, 2, 11025, 11025 * 2, 2, 8)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"          # foreign chunk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size + pad
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    info = parse_wav(payload)
    assert (info.sample_rate, info.channels, info.bits) == (11025, 2, 8)
    assert info.n_samples == 4
    assert np.allclose(info.waveform, 0.0)


def test_parse_image_dims_golden_bytes():
    import struct
    import zlib

    import numpy as np

    from hadoop_stuff_spark.functions.media import encode_bmp, parse_image_dims

    # PNG: signature + IHDR chunk for 640x480
    ihdr = struct.pack(">II", 640, 480) + bytes([8, 2, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    assert parse_image_dims(png) == ("png", 640, 480)

    # GIF89a 320x200
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_dims(gif) == ("gif", 320, 200)

    # JPEG: SOI + APP0 + SOF0 (100x50)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 50, 100) + b"\x01"
    assert parse_image_dims(b"\xff\xd8" + app0 + sof0) == ("jpeg", 100, 50)

    # BMP through our own encoder
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    assert parse_image_dims(encode_bmp(img)) == ("bmp", 3, 2)

    # not an image → None
    assert parse_image_dims(b"plain old text") is None


def test_bmp_roundtrip_and_nearest_resize():
    import numpy as np

    from hadoop_stuff_spark.functions.media import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint16).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)  # exact roundtrip

    big = resize_nearest(img, 6, 10)  # 2x in each dim: pure pixel doubling
    assert big.shape == (10, 6, 3)
    assert np.array_equal(big[::2, ::2], img)
    assert np.array_equal(big[1::2, 1::2], img)


def test_audio_stats_decodes_real_wav_through_spark(spark):
    """The Spark operator path: WAV rows get REAL container sample rate
    and duration; non-WAV rows take the documented byte-waveform
    fallback."""
    import numpy as np

    from hadoop_stuff_spark.functions.media import make_wav
    from hadoop_stuff_spark.operators.multimodal import (
        AUDIO_SAMPLE_RATE,
        extract_audio_stats,
    )

    t = np.arange(4000) / 8000.0
    wav = make_wav(0.25 * np.sin(2 * np.pi * 220 * t), sample_rate=8000)
    rows = [(1, bytearray(wav)), (2, bytearray(b"not audio at all"))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_audio_stats(media).collect()}

    assert got[1].sample_rate == 8000
    assert got[1].n_samples == 4000
    assert abs(got[1].duration_s - 0.5) < 1e-6
    assert abs(got[1].rms - 0.25 / np.sqrt(2)) < 1e-3
    assert got[2].sample_rate == AUDIO_SAMPLE_RATE  # fallback path
    assert got[2].n_samples == len(b"not audio at all")


def test_resize_media_real_bmp_through_spark(spark):
    """resize_media on a real BMP decodes, nearest-neighbor resizes and
    re-encodes — the output payload is a valid BMP with the target dims
    and the exact expected pixels."""
    import numpy as np

    from hadoop_stuff_spark.functions.media import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )
    from hadoop_stuff_spark.operators.multimodal import resize_media

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint16).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_bmp(img)), "image/bmp")],
        "doc_id long, payload binary, media_type string",
    )
    out = resize_media(media, width=6, height=8).collect()[0]
    decoded = decode_bmp(bytes(out.payload))
    assert decoded.shape == (8, 6, 3)
    assert np.array_equal(decoded, resize_nearest(img, 6, 8))


def test_media_features_real_dims_for_images(spark):
    """extract_media_features reports the TRUE container dimensions for
    decodable images (BMP real pixels; PNG header), stub dims otherwise."""
    import struct
    import zlib

    import numpy as np

    from hadoop_stuff_spark.functions.media import encode_bmp
    from hadoop_stuff_spark.operators.multimodal import extract_media_features

    img = np.full((4, 7, 3), 200, dtype=np.uint8)
    img[:2, :, 0] = 10
    ihdr = struct.pack(">II", 33, 44) + bytes([8, 2, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    rows = [
        (1, bytearray(encode_bmp(img)), "image/bmp", 0),
        (2, bytearray(png), "image/png", 0),
        (3, bytearray(b"free text"), "text/plain", 0),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string, n_bytes long"
    )
    got = {r.doc_id: r for r in extract_media_features(media).collect()}
    assert (got[1].width, got[1].height) == (7, 4)
    # BMP features are real per-channel means: G and B uniform at 200/255
    assert abs(got[1].feature[1] - 200 / 255) < 1e-6
    assert abs(got[1].feature[2] - 200 / 255) < 1e-6
    assert (got[2].width, got[2].height) == (33, 44)
    assert (got[3].width, got[3].height) == (len(b"free text") % 1024, 1)


def test_media_ahash_is_true_perceptual_hash_for_bmp(spark):
    """Identical images hash identically; a lightly-noised copy lands
    within a small Hamming distance; an inverted image lands far away —
    over REAL decoded pixels, not payload bytes."""
    import numpy as np

    from hadoop_stuff_spark.functions.media import encode_bmp
    from hadoop_stuff_spark.operators.multimodal import media_ahash

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint16).astype(np.uint8)
    noised = base.copy()
    noised[0, 0] = 255 - noised[0, 0]  # one pixel of 1024
    rows = [
        (1, bytearray(encode_bmp(base))),
        (2, bytearray(encode_bmp(base))),
        (3, bytearray(encode_bmp(noised))),
        (4, bytearray(encode_bmp(255 - base))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = {r.doc_id: r.ahash for r in media_ahash(media).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert h[1] == h[2]
    assert ham(h[1], h[3]) <= 2
    assert ham(h[1], h[4]) >= 50


def test_sample_frames_decodes_real_avi_through_spark(spark):
    """sample_frames on a real (handcrafted, uncompressed) AVI emits the
    TRUE every-n-th frames with their real indices, and each sampled
    frame's bytes decode back to the exact source pixels; a non-video
    payload on the same frame takes the documented byte-slice fallback."""
    import numpy as np

    from hadoop_stuff_spark.functions.media import (
        decode_avi_frame,
        make_avi,
        parse_avi,
    )
    from hadoop_stuff_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(9)
    frames = [
        rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint16).astype(np.uint8)
        for _ in range(10)
    ]
    avi = make_avi(frames, fps=5)
    media = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"x" * 600))],
        "doc_id long, payload binary",
    )
    out = sample_frames(media, every_n=4).collect()
    by_doc: dict[int, dict[int, bytes]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.frame_idx] = bytes(r.frame)

    assert sorted(by_doc[1]) == [0, 4, 8]  # true frame indices
    info = parse_avi(avi)
    for idx in (0, 4, 8):
        assert by_doc[1][idx] == info.frames[idx]
        decoded = np.frombuffer(by_doc[1][idx][: 8 * 20], dtype=np.uint8)
        assert len(decoded) > 0
        assert np.array_equal(decode_avi_frame(info, idx), frames[idx])
    assert sorted(by_doc[2]) == [0]  # 600 bytes → 3 stub frames, every 4th


def test_avi_roundtrip_and_metadata():
    import numpy as np

    from hadoop_stuff_spark.functions.media import (
        decode_avi_frame,
        make_avi,
        parse_avi,
    )

    rng = np.random.default_rng(13)
    frames = [
        rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint16).astype(np.uint8)
        for _ in range(4)
    ]
    info = parse_avi(make_avi(frames, fps=25))
    assert (info.width, info.height, info.n_frames) == (7, 5, 4)
    assert abs(info.fps - 25.0) < 1e-6
    for i, f in enumerate(frames):
        assert np.array_equal(decode_avi_frame(info, i), f)


def test_pil_only_formats_take_pil_path_when_pil_present(monkeypatch):
    """ADVICE r4 low: formats parse_image_dims can't parse (WebP, TIFF)
    must still get a REAL decode when PIL is importable — pre-fix the
    PIL branch was only reachable AFTER parse_image_dims recognized the
    container, so PIL-only formats silently took the stub. PIL isn't in
    this container, so the seam (media.pil_open) is faked: a minimal
    image object proves the routing; pil_open returning None proves the
    stub fallback."""
    import numpy as np

    from hadoop_stuff_spark.functions import media as M
    from hadoop_stuff_spark.operators import multimodal as MM

    class FakeImg:
        size = (4, 2)

        def convert(self, mode):
            return self

        def resize(self, wh):
            self.size = wh
            return self

        def __array__(self, dtype=None, copy=None):
            w, h = self.size
            a = np.full((h, w, 3), 128, dtype=np.uint8)
            return a.astype(dtype) if dtype is not None else a

    webp_ish = b"RIFF\x00\x00\x00\x00WEBPVP8 "  # parse_image_dims: None
    assert M.parse_image_dims(webp_ish) is None

    monkeypatch.setattr(M, "pil_open", lambda payload: FakeImg())
    feats, w, h = MM._decode_media(webp_ish)
    assert (w, h) == (4, 2)                      # REAL dims via PIL path
    assert abs(feats[0] - 128 / 255) < 1e-6       # REAL pixel mean
    resized = MM._resize_media(webp_ish, 8, 8)
    assert M.parse_image_dims(resized)[:1] == ("bmp",)  # re-encoded BMP
    ah = MM._ahash_payload(webp_ish)
    assert isinstance(ah, int)

    # PIL absent / undecodable → deterministic stub, never a crash
    monkeypatch.setattr(M, "pil_open", lambda payload: None)
    feats2, w2, h2 = MM._decode_media(webp_ish)
    assert feats2 == MM._decode_stub(webp_ish)[0]
    assert MM._resize_media(webp_ish, 8, 8) == MM._resize_stub(webp_ish, 8, 8)


def test_pil_open_returns_none_without_pil():
    """Capability gate: with PIL unimportable (this container),
    pil_open must return None for any payload rather than raise."""
    from hadoop_stuff_spark.functions import media as M

    if M.pil_available():  # environment gained PIL — gate is moot here
        return
    assert M.pil_open(b"RIFF\x00\x00\x00\x00WEBPVP8 ") is None
    assert M.pil_open(b"") is None
