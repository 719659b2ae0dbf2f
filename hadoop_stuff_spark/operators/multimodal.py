"""Multimodal column plumbing (SURVEY.md §2.7 N4): image/audio/video
treated as opaque ``binary`` columns + typed metadata, processed via
Arrow-batched mapInPandas.

Decode is REAL where the container format allows it without codec
libraries (functions/media.py): RIFF/WAV audio is chunk-walked and its
PCM samples decoded (sample rate, duration, RMS, peak are computed from
actual audio), PNG/BMP/GIF/JPEG headers yield real dimensions, and BMP
images are fully decoded / nearest-neighbor resized / re-encoded. PIL,
when importable, extends real decode to every other image format
(capability gate `media.pil_available()` — same code lights up where the
dependency exists). Only payloads in none of those formats fall back to
the documented deterministic stubs, so the operators never crash on the
text-derived testdata blobs while behaving as real decoders on real
media. Video frames are REAL for RIFF/AVI containers (movi chunk walk;
uncompressed frames decode to pixels) — only compressed-codec pixel
decode genuinely needs PyAV and stays stubbed.

The testdata has no binary table, so :func:`synthesize_blobs` derives a
binary column from ``documents.text`` (utf-8 bytes) — the same shape a real
media column would have (binary payload + metadata columns).
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hadoop_stuff_spark.catalog import load_table, spread

FEATURE_DIM = 8

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


_ARROW_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


@contextmanager
def arrow_batch_rows(spark: SparkSession, rows: int):
    """Bound Python-worker memory for binary-heavy mapInPandas stages: the
    Arrow reader hands the UDF at most ``rows`` rows per batch, so peak
    per-worker memory ≈ rows × max_payload_bytes regardless of partition
    size. The conf is session-wide and read at EXECUTION time, so this is a
    context manager to wrap the *action* — the previous value is restored
    on exit instead of leaking into every later pandas-UDF query::

        with arrow_batch_rows(spark, 64):
            extract_media_features(blobs).write.parquet(out)

    The testdata's ~KB blobs don't need it; MB-scale media at 100 TB does.
    """
    prev = spark.conf.get(_ARROW_BATCH_CONF, None)
    spark.conf.set(_ARROW_BATCH_CONF, str(rows))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_ARROW_BATCH_CONF)
        else:
            spark.conf.set(_ARROW_BATCH_CONF, prev)


def synthesize_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → binary payload + metadata (media-table shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> tuple[list[float], int, int]:
    """FALLBACK decode/feature-extract for payloads in no parseable
    format: deterministic byte-histogram moments as the FEATURE_DIM-dim
    feature and fake dimensions from the length. Kept so unknown blobs
    flow through the pipeline instead of crashing the scan."""
    import numpy as np

    n = len(payload)
    if n:
        arr = np.frombuffer(payload, dtype=np.uint8)
        buckets = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
        feats = (buckets / n).tolist()
    else:
        feats = [0.0] * FEATURE_DIM
    return feats, int(n % 1024), int(n // 1024 + 1)


def _decode_media(payload: bytes) -> tuple[list[float], int, int]:
    """REAL decode where the format allows (functions/media.py), stub
    fallback otherwise. BMP pixels yield real per-channel mean/std
    features + exact dims; other known containers yield exact dims with
    histogram features; PIL (when present) covers the rest."""
    import numpy as np

    from hadoop_stuff_spark.functions import media as M

    try:
        dims = M.parse_image_dims(payload)
    except Exception:
        dims = None
    if dims is not None and dims[0] == "bmp":
        try:
            w, h = dims[1], dims[2]
            img = M.decode_bmp(payload).astype(np.float32) / 255.0
            feats = (
                list(img.mean(axis=(0, 1)))
                + list(img.std(axis=(0, 1)))
                + [w / max(h, 1), 1.0]
            )
            return [float(x) for x in feats[:FEATURE_DIM]], w, h
        except (ValueError, NotImplementedError):
            pass
    # PIL covers both formats parse_image_dims recognized (non-BMP) AND
    # PIL-only formats it didn't (WebP, TIFF, ...) — pil_open decodes or
    # returns None.
    pil_img = M.pil_open(payload)
    if pil_img is not None:
        w, h = pil_img.size
        img = np.asarray(pil_img.convert("RGB"), dtype=np.float32) / 255.0
        feats = (
            list(img.mean(axis=(0, 1)))
            + list(img.std(axis=(0, 1)))
            + [w / max(h, 1), 1.0]
        )
        return [float(x) for x in feats[:FEATURE_DIM]], w, h
    if dims is not None:
        feats, _, _ = _decode_stub(payload)
        return feats, dims[1], dims[2]
    return _decode_stub(payload)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas over binary payloads → feature vectors + dims. Arrow
    moves the binary column in batches; one Python worker per partition —
    this is the pattern for any heavy per-blob decode at scale (partition
    count controls parallelism; no shuffle). For large payloads bound
    per-worker memory by wrapping the action in
    :func:`arrow_batch_rows`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for payload in pdf["payload"]:
                f, w, h = _decode_media(bytes(payload) if payload is not None else b"")
                feats.append(f)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                    "width": widths,
                    "height": heights,
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """FALLBACK resize for unknown formats: payload truncated/cycled to
    width*height bytes — deterministic, keeps unknown blobs flowing."""
    target = width * height
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def _resize_media(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize where decodable: BMP via the zero-dep decode →
    nearest-neighbor → re-encode path (functions/media.py); any
    PIL-supported format when PIL is importable (emitted as BMP so the
    output stays decodable in this environment); stub otherwise."""
    from hadoop_stuff_spark.functions import media as M

    try:
        dims = M.parse_image_dims(payload)
    except Exception:
        dims = None
    if dims is not None and dims[0] == "bmp":
        try:
            return M.encode_bmp(
                M.resize_nearest(M.decode_bmp(payload), width, height)
            )
        except (ValueError, NotImplementedError):
            pass
    pil_img = M.pil_open(payload)  # incl. PIL-only formats (WebP/TIFF)
    if pil_img is not None:
        import numpy as np

        img = np.asarray(
            pil_img.convert("RGB").resize((width, height)),
            dtype=np.uint8,
        )
        return M.encode_bmp(img)
    return _resize_stub(payload, width, height)


def resize_media(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
) -> DataFrame:
    """1→1 mapInPandas resize stage: binary in, binary out, fixed target
    dims. At scale this is pure map work — no shuffle; parallelism = input
    partitions; wrap the action in :func:`arrow_batch_rows` to bound
    Python-worker memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _resize_media(bytes(p) if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

FRAME_SIZE = 256  # stub "frame" = 256-byte slice of the payload


def _frames_stub(payload: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """FALLBACK frame sampler for non-video payloads: the payload is cut
    into FRAME_SIZE-byte 'frames'; every n-th is kept — deterministic,
    and the 1→N row-expansion shape is identical to the real thing."""
    n_frames = (len(payload) + FRAME_SIZE - 1) // FRAME_SIZE
    out = []
    for idx in range(0, n_frames, every_n):
        out.append((idx, payload[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]))
    return out


def _frames_decode(payload: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """REAL frame sampling for RIFF/AVI containers (functions/media.py):
    the RIFF tree's movi LIST yields the TRUE per-frame chunks; every
    n-th frame's raw bytes are emitted with its real index. Uncompressed
    ('00db') frames are literal bitmaps decodable downstream with
    media.decode_avi_frame; compressed streams still get correct frame
    boundaries (pixel decode of those is the one remaining PyAV-gated
    stub). Non-AVI payloads take the byte-slice fallback."""
    from hadoop_stuff_spark.functions import media as M

    if M.is_avi(payload):
        try:
            info = M.parse_avi(payload)
            return [
                (idx, info.frames[idx])
                for idx in range(0, len(info.frames), every_n)
            ]
        except ValueError:
            pass
    return _frames_stub(payload, every_n)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """1→N mapInPandas frame-sampling stage (UDTF shape — one input blob
    yields many frame rows). Output rows stay in the producing partition;
    downstream repartition() is the knob if frame counts skew."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, frame in _frames_decode(
                    bytes(payload) if payload is not None else b"", every_n
                ):
                    ids.append(doc_id)
                    idxs.append(idx)
                    frames.append(frame)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


def media_metadata_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the multimodal path: byte lengths + sha256
    content hash of the binary payload (no stubbed features involved)."""
    blobs = synthesize_blobs(spark, sf_dir)
    return blobs.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


def frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling certification query: sampled-frame count per doc
    through the real mapInPandas path; the oracle recomputes the count
    arithmetically from byte lengths (ceil(ceil(bytes/256)/4))."""
    blobs = synthesize_blobs(spark, sf_dir)
    return (
        sample_frames(blobs, every_n=4)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )


FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(ceil(ceil(strlen(text) / {FRAME_SIZE}.0) / 4.0) AS BIGINT) AS n_frames
FROM documents
WHERE strlen(text) > 0
"""


MEDIA_META_SQL = """
SELECT doc_id, 'text/plain' AS media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes, sha256(text) AS sha
FROM documents
"""


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", FloatType()),
        StructField("rms", FloatType()),
        StructField("peak", FloatType()),
    ]
)

AUDIO_SAMPLE_RATE = 16000  # stub container metadata


def _audio_stub(payload: bytes) -> tuple[int, int, float, float, float]:
    """FALLBACK for non-WAV payloads: bytes ARE the waveform (uint8
    centered at 128, one 'sample' per byte at a fixed nominal sample
    rate) — deterministic, same output shape as the real decode."""
    import numpy as np

    wave = (np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    n = len(wave)
    rms = float(np.sqrt((wave**2).mean())) if n else 0.0
    peak = float(np.abs(wave).max()) if n else 0.0
    return AUDIO_SAMPLE_RATE, n, n / AUDIO_SAMPLE_RATE, rms, peak


def _audio_decode(payload: bytes) -> tuple[int, int, float, float, float]:
    """REAL RIFF/WAV decode (functions/media.py — chunk walk, PCM
    8/16/32-bit, multi-channel averaged): sample rate and duration come
    from the actual container, RMS/peak from the actual samples. Non-WAV
    payloads take the documented byte-waveform fallback; malformed or
    non-PCM WAVs also fall back rather than crash the scan (a DQ gate is
    where rejection policy belongs)."""
    from hadoop_stuff_spark.functions import media as M

    if M.is_wav(payload):
        import numpy as np

        try:
            info = M.parse_wav(payload)
            wave = info.waveform
            rms = float(np.sqrt((wave**2).mean())) if len(wave) else 0.0
            peak = float(np.abs(wave).max()) if len(wave) else 0.0
            return info.sample_rate, info.n_samples, info.duration_s, rms, peak
        except (ValueError, NotImplementedError):
            pass
    return _audio_stub(payload)


def extract_audio_stats(media: DataFrame) -> DataFrame:
    """Audio-shaped mapInPandas stage: binary payload → sample-rate /
    duration metadata + waveform statistics (RMS, peak). Pure map work —
    no shuffle; the numpy inner loop is vectorized per blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _audio_decode(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "duration_s": [r[2] for r in rows],
                    "rms": [r[3] for r in rows],
                    "peak": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(run, AUDIO_SCHEMA)


def audio_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the audio path: n_samples equals the
    payload byte length (duration = bytes / 16000), rounded stats omitted
    (float reductions differ in reduction order) — byte-count and duration
    are exact."""
    blobs = synthesize_blobs(spark, sf_dir)
    return extract_audio_stats(blobs).select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.round("duration_s", 4).alias("duration_s"),
    )


AUDIO_STATS_SQL = f"""
SELECT doc_id, {AUDIO_SAMPLE_RATE} AS sample_rate,
       CAST(strlen(text) AS BIGINT) AS n_samples,
       round(CAST(strlen(text) AS FLOAT) / {AUDIO_SAMPLE_RATE}, 4) AS duration_s
FROM documents
"""


# ---------------------------------------------------------------------------
# perceptual-hash near-dup for media columns (N1 x N4)


def _ahash64(arr) -> int:
    """64-bit average hash of a byte stream: 64 equal segments, bit i set
    iff segment i's mean > global mean. Deterministic; tolerant of small
    payload edits (few bits flip), which is exactly the near-dup contract.
    Real images would aHash the decoded grayscale thumbnail instead —
    same 64-sample → threshold → packbits pipeline, swap the decode."""
    import numpy as np

    if arr.size == 0:
        return 0
    take = (arr.size // 64) * 64
    if take == 0:
        seg = np.pad(arr.astype(np.float64), (0, 64 - arr.size))[:64]
    else:
        seg = arr[:take].astype(np.float64).reshape(64, -1).mean(axis=1)
    bits = (seg > arr.astype(np.float64).mean()).astype(np.uint8)
    # signed view keeps all 64 bits intact for a Spark `long` column —
    # int(np.packbits(...).view('>u8')) would overflow int64 whenever the
    # top bit is set, and NumPy 2.x raises on that instead of wrapping
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)


def _ahash_payload(payload: bytes) -> int:
    """True average-hash for decodable images: decode → 8×8
    nearest-neighbor thumbnail → grayscale → bit i set iff pixel i >
    mean. Non-image payloads hash their raw bytes through the same
    64-segment threshold kernel (`_ahash64`) so every blob gets a
    comparable 64-bit signature."""
    import numpy as np

    from hadoop_stuff_spark.functions import media as M

    try:
        dims = M.parse_image_dims(payload)
    except Exception:
        dims = None
    if dims is not None and dims[0] == "bmp":
        try:
            thumb = M.resize_nearest(M.decode_bmp(payload), 8, 8)
            gray = thumb.astype(np.float64).mean(axis=2).ravel()
            bits = (gray > gray.mean()).astype(np.uint8)
            return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)
        except (ValueError, NotImplementedError):
            pass
    pil_img = M.pil_open(payload)  # incl. PIL-only formats (WebP/TIFF)
    if pil_img is not None:
        gray = np.asarray(
            pil_img.convert("L").resize((8, 8)), dtype=np.float64
        ).ravel()
        bits = (gray > gray.mean()).astype(np.uint8)
        return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)
    return _ahash64(np.frombuffer(payload, dtype=np.uint8))


def media_ahash(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, ahash long) per media row — one numpy pass per Arrow batch
    over the payload bytes; decodable images get a TRUE 8×8 perceptual
    average-hash over their pixels (`_ahash_payload`)."""

    out_schema = f"{id_col} long, ahash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [_ahash_payload(bytes(p or b"")) for p in pdf["payload"]]
            yield pd.DataFrame({id_col: pdf[id_col], "ahash": hashes})

    return media.select(id_col, "payload").mapInPandas(run, out_schema)


def media_near_dups(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate media pairs: perceptual hash + the SAME banded
    Hamming blocking the text SimHash path certifies
    (dedup.banded_hamming_pairs) — signature sources differ, the
    scale-proof join is shared. Rows-only (hash algebra is not
    SQL-expressible); tests seed byte-identical and lightly-corrupted
    payloads and assert both are found with the expected distances."""
    from hadoop_stuff_spark.operators.dedup import banded_hamming_pairs

    blobs = spread(synthesize_blobs(spark, sf_dir))
    return banded_hamming_pairs(
        media_ahash(blobs), "doc_id", "ahash", max_hamming
    ).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming"
    )
