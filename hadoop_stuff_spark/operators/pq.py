"""Product-quantization (PQ) ANN over the embeddings table — the
compressed-domain complement to IVF (operators/similarity.py).

PQ splits each d-dim vector into ``m`` subvectors and quantizes each
against its own k=2^nbits-entry codebook: a vector becomes ``m`` small
codes (here m=16 × 4 bits = 8 bytes vs 256 bytes of float32 — a 32×
storage/scan cut). Query scoring is asymmetric-distance (ADC): per query
precompute the (m × k) table of <q_sub, centroid> dots, then a corpus
vector's approximate dot is m table lookups — no float vector is touched
until the final exact re-rank of the short candidate list.

Scale shape: codebooks are a ~KB driver artifact (trained once on a
deterministic sample, like the IVF centroids); encoding is one Arrow
batch matmul per partition; ADC scoring is a numpy gather over the codes
column; only (query, candidate) id pairs shuffle; the exact re-rank
touches |candidates| × d floats. Honesty note (same as IVF): the driver's
embeddings are unclustered gaussian noise — the hardest case for PQ;
recall targets in tests are set for that regime, real clustered
embeddings do much better at the same code budget.

Deterministic end to end: sample by xxhash64 order, k-means init = first
k sample rows per subspace, fixed Lloyd iteration count, ties broken by
lowest index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf

from hadoop_stuff_spark.catalog import load_table, spread
from hadoop_stuff_spark.functions.vectors import cosine, l2_norm

DIM = 64


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 16,
    nbits: int = 4,
    iters: int = 10,
    sample_n: int = 1024,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """(m, k, d/m) codebooks via per-subspace Lloyd k-means on a
    deterministic hash-ordered sample (driver-side numpy on ≤ sample_n
    rows — same footprint class as the IVF centroid pick)."""
    k = 1 << nbits
    rows = (
        emb.select(id_col, vec_col).orderBy(F.xxhash64(id_col)).limit(sample_n).collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    books = np.empty((m, k, dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = sub[:k].copy()  # deterministic init: first k sample rows
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books[j] = cents
    return books


def encode_pq(
    emb: DataFrame, codebooks: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``codes array<int>`` (length m) and ``recon_nrm double`` (L2
    norm of the reconstructed vector, needed for cosine ADC). One numpy
    pass per Arrow batch."""
    m, k, dsub = codebooks.shape

    @pandas_udf("struct<codes: array<int>, recon_nrm: double>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        n = x.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        recon = np.empty_like(x)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            codes[:, j] = assign
            recon[:, j * dsub : (j + 1) * dsub] = codebooks[j][assign]
        nrm = np.linalg.norm(recon, axis=1)
        return pd.DataFrame({"codes": list(codes), "recon_nrm": nrm})

    out = emb.withColumn("_pq", enc(F.col(vec_col)))
    return out.select("*", F.col("_pq.codes").alias("codes"), F.col("_pq.recon_nrm").alias("recon_nrm")).drop("_pq")


def topk_cosine_pq(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
    m: int = 16,
    nbits: int = 4,
    rerank: int = 80,
) -> DataFrame:
    """PQ-ADC top-k: score every corpus vector from its 8-byte code via
    per-query lookup tables, keep the top ``rerank`` candidates per query,
    exact-cosine re-rank those. Output matches the brute-force schema
    (query_id, vec_id, sim, rk) with EXACT sims (re-ranked), so results
    are comparable to the oracle baseline query.

    Scale shape (the part that must survive 100 TB):
    - encode + ADC + per-partition partial top-``rerank`` are FUSED into a
      single mapInPandas pass — one Python stage, and the only rows that
      ever leave an executor are (query, candidate, approx_sim) partials,
      never the n x n_q scored matrix (an earlier explode-based version
      shuffled every score and let Catalyst's inferred ``size(arr) > 0``
      pushdown re-evaluate the UDF chain twice).
    - the global top-``rerank`` merge then sees only
      n_partitions x n_q x rerank rows, and the exact re-rank BROADCASTS
      the tiny candidate list into the corpus scan (map-side semi-join)
      instead of shuffling the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=m, nbits=nbits)
    dsub = books.shape[2]

    q_rows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    qmat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    qnrm = np.linalg.norm(qmat, axis=1)
    # LUT[q, j, c] = <q_sub_j, centroid_c_j>
    lut = np.stack(
        [
            np.stack(
                [qmat[:, j * dsub : (j + 1) * dsub] @ books[j][c] for c in range(books.shape[1])],
                axis=1,
            )
            for j in range(m)
        ],
        axis=1,
    )  # shape (n_q, m, k)

    n_q = len(q_ids)
    # one extra slot so a query vector appearing in its own batch cannot
    # evict the rerank-th real candidate before the self-pair filter
    take_n = rerank + 1

    def score_partition(batches):
        cols = np.arange(m)[None, :]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = x.shape[0]
            codes = np.empty((n, m), dtype=np.int64)
            recon = np.empty_like(x)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                codes[:, j] = assign
                recon[:, j * dsub : (j + 1) * dsub] = books[j][assign]
            rnrm = np.linalg.norm(recon, axis=1)
            dots = lut[:, cols, codes].sum(axis=2)  # (n_q, n)
            sims = dots / np.maximum(qnrm[:, None] * rnrm[None, :], 1e-12)
            ids = pdf["vec_id"].to_numpy().astype(np.int64)
            take = min(take_n, n)
            # partial top-take per query, deterministic (-sim, vec_id) order;
            # correctness: any global top-rerank candidate ranks <= take in
            # its own batch, so per-batch partials are a superset
            order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)[
                :, :take
            ]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, take),
                    "vec_id": ids[order].ravel(),
                    "approx_sim": np.take_along_axis(sims, order, axis=1).ravel(),
                }
            )

    scored = (
        spread(emb)
        .select("vec_id", "embedding")
        .mapInPandas(score_partition, "query_id long, vec_id long, approx_sim double")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), F.asc("vec_id"))
    cands = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= rerank)
        .select("query_id", "vec_id")
    )
    # exact re-rank: broadcast the (n_q x rerank) candidate list and the
    # n_q query vectors into one corpus scan — no corpus shuffle
    ev = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")).filter(
        F.col("query_id").isin(*[int(i) for i in q_ids])
    )
    exact = (
        emb.select("vec_id", F.col("embedding").alias("cvec"))
        .join(broadcast(cands), "vec_id")
        .join(broadcast(ev), "query_id")
        .select(
            "query_id", "vec_id", F.round(cosine("qvec", "cvec"), 6).alias("sim")
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        exact.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "sim", F.col("rk").cast("int").alias("rk"))
    )
