"""Batch text embedding — the inference stage between chunking and
similarity/ANN in a RAG or dedup pipeline.

Plumbing is the production shape: Arrow-batched pandas UDF, one
vectorized call per batch, fixed output dim, L2-normalized float32 —
drop in a real encoder by replacing `_encode_batch` (load the model
lazily ONCE per worker — module-level cache, never per batch; for a
remote embedding service, batch the HTTP call over the whole Arrow
batch). The built-in encoder is a DETERMINISTIC STUB (clearly marked,
same policy as operators/multimodal.py): each text's md5 seeds a
counter-based generator, so embeddings are stable across runs,
partitionings, and machines — which is what lets the e2e tests assert
exact pipeline results with no model in the container.

Scale shape: map-only (zero shuffle); composes upstream with
`chunking.chunk_documents` and downstream with `similarity.*` /
`pq.*` / `dedup.embedding_cosine_dups_lsh`, and the output schema
(`array<float>` + id) is exactly the embeddings-table contract the ANN
operators already certify against.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DIM = 64


def _stub_vectors(texts: pd.Series, dim: int) -> np.ndarray:
    """STUB ENCODER — md5-seeded, deterministic, L2-normalized.
    REAL-MODEL SWAP POINT: replace this function's body with a cached
    model's batched encode() keeping the (texts in, (n, dim) float32
    out) contract."""
    out = np.empty((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        digest = hashlib.md5((t or "").encode()).digest()
        # counter-based expansion of the 16-byte digest to dim floats
        seeds = np.frombuffer(
            b"".join(
                hashlib.md5(digest + j.to_bytes(2, "little")).digest()
                for j in range((dim * 8) // 16 + 1)
            ),
            dtype=np.uint64,
        )[:dim]
        out[i] = (seeds.astype(np.float64) / 2**64) * 2.0 - 1.0
    nrm = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return (out / nrm).astype(np.float32)


def embed_text(
    df: DataFrame, text_col: str = "chunk_text", dim: int = DIM,
    out_col: str = "embedding",
) -> DataFrame:
    """Add ``out_col array<float>`` (L2-normalized, ``dim``-dimensional)."""

    @pandas_udf("array<float>")
    def enc(texts: pd.Series) -> pd.Series:
        vecs = _stub_vectors(texts, dim)
        return pd.Series(list(vecs))

    return df.withColumn(out_col, enc(F.col(text_col)))
