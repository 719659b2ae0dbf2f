"""Similarity-search properties: exact cosine against NumPy, LSH recall
against the brute-force oracle (SURVEY.md §7: approximate ops get a
recall@k threshold, not hash equality)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_stuff_spark.functions.vectors import cosine, l2_norm
from hadoop_stuff_spark.operators.similarity import (
    embedding_norm_stats,
    topk_cosine_bruteforce,
    topk_cosine_ivf,
    topk_cosine_lsh,
)


def test_cosine_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a = rng.standard_normal(64).astype("float32")
    b = rng.standard_normal(64).astype("float32")
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "a: array<float>, b: array<float>"
    )
    [row] = df.select(cosine("a", "b").alias("c"), l2_norm("a").alias("na")).collect()
    ad, bd = a.astype("float64"), b.astype("float64")
    expected = float(ad @ bd / (np.linalg.norm(ad) * np.linalg.norm(bd)))
    assert row.c == pytest.approx(expected, abs=1e-12)
    assert row.na == pytest.approx(float(np.linalg.norm(ad)), abs=1e-12)


def test_bruteforce_topk_is_exact(spark, sf_dir):
    """Spark brute-force top-k vs a NumPy full-similarity computation."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in emb}
    got = topk_cosine_bruteforce(spark, sf_dir, n_queries=3, k=5).collect()
    for qid in range(3):
        q = vecs[qid]
        sims = {
            vid: round(float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 6)
            for vid, v in vecs.items()
            if vid != qid
        }
        expect = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        mine = [(r.vec_id, r.sim) for r in sorted(got, key=lambda r: r.rk) if r.query_id == qid]
        assert mine == expect, f"query {qid}"


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Recall@10 of the LSH path vs the exact oracle must clear 0.6 on
    average (4 bands × 8 bits on 64-dim random data)."""
    exact = topk_cosine_bruteforce(spark, sf_dir, n_queries=5, k=10).collect()
    approx = topk_cosine_lsh(spark, sf_dir, n_queries=5, k=10).collect()
    recalls = []
    for qid in range(5):
        e = {r.vec_id for r in exact if r.query_id == qid}
        a = {r.vec_id for r in approx if r.query_id == qid}
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_recall_and_pruning(spark, sf_dir):
    """IVF path: recall@10 ≥ 0.5 at n_probe=8/16 on unclustered data
    (measured 0.62; real clustered embeddings do far better), and the
    result shape matches the exact path."""
    exact = topk_cosine_bruteforce(spark, sf_dir, n_queries=5, k=10).collect()
    approx_df = topk_cosine_ivf(spark, sf_dir, n_queries=5, k=10)
    assert approx_df.columns == ["query_id", "vec_id", "sim", "rk"]
    approx = approx_df.collect()
    recalls = []
    for qid in range(5):
        e = {r.vec_id for r in exact if r.query_id == qid}
        a = {r.vec_id for r in approx if r.query_id == qid}
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # approx sims are true cosines: every returned (q, v, sim) that also
    # appears in exact must carry the identical rounded similarity
    exact_sims = {(r.query_id, r.vec_id): r.sim for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in exact_sims:
            assert r.sim == exact_sims[(r.query_id, r.vec_id)]


def test_norm_stats_counts(spark, sf_dir):
    out = embedding_norm_stats(spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()


def test_pq_topk_recall_and_determinism(spark, sf_dir):
    """PQ-ADC + exact re-rank: recall@10 vs the exact brute force, stable
    across runs. Threshold set for the unclustered-gaussian testdata (the
    PQ worst case — see operators/pq.py docstring)."""
    from hadoop_stuff_spark.operators.pq import topk_cosine_pq
    from hadoop_stuff_spark.operators.similarity import topk_cosine_bruteforce

    exact = {
        (r.query_id, r.vec_id)
        for r in topk_cosine_bruteforce(spark, sf_dir).collect()
    }
    got1 = topk_cosine_pq(spark, sf_dir)
    rows1 = {(r.query_id, r.vec_id) for r in got1.collect()}
    recall = len(rows1 & exact) / len(exact)
    assert recall >= 0.5, f"PQ recall@10 too low: {recall}"
    # determinism: identical result set on a second run
    rows2 = {
        (r.query_id, r.vec_id) for r in topk_cosine_pq(spark, sf_dir).collect()
    }
    assert rows1 == rows2
    # sims are EXACT (re-ranked): every returned pair's sim matches brute
    bf = {
        (r.query_id, r.vec_id): r.sim
        for r in topk_cosine_bruteforce(spark, sf_dir, k=500).collect()
    }
    for r in got1.collect():
        assert abs(bf[(r.query_id, r.vec_id)] - r.sim) < 1e-9


def test_pq_codes_are_compact_and_deterministic(spark, sf_dir):
    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.pq import encode_pq, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=16, nbits=4)
    assert books.shape == (16, 16, 4)
    enc = encode_pq(emb.limit(200), books)
    rows = enc.select("vec_id", "codes", "recon_nrm").collect()
    assert len(rows) == 200
    for r in rows[:30]:
        assert len(r.codes) == 16
        assert all(0 <= c < 16 for c in r.codes)
        assert r.recon_nrm > 0
    again = {
        r.vec_id: tuple(r.codes)
        for r in encode_pq(emb.limit(200), books).collect()
    }
    assert {r.vec_id: tuple(r.codes) for r in rows} == again
