"""MMR diversified top-k: lam=1.0 degenerates EXACTLY to the certified
brute-force top-k; the distributed greedy replays a plain-Python
reference bit-for-bit on the real corpus; and on a planted
near-duplicate fixture MMR spends its second slot on coverage while
plain top-k wastes it on the duplicate."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hadoop_stuff_spark.operators.similarity import (
    n2_mmr_diversified_topk,
    topk_cosine_bruteforce,
)


def test_mmr_lambda_one_equals_bruteforce(spark, sf_dir):
    brute = {
        (r["query_id"], r["rk"]): (r["vec_id"], r["sim"])
        for r in topk_cosine_bruteforce(spark, sf_dir, k=10).collect()
    }
    mmr = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["relevance"])
        for r in n2_mmr_diversified_topk(spark, sf_dir, k=10, lam=1.0).collect()
    }
    assert mmr == brute


def _reference_mmr(cands, k, lam):
    """Independent plain-Python greedy with the operator's exact rails:
    vec_id-sorted pool, 6 dp pool sims, 9 dp scores, (score desc,
    vec_id asc) ties."""
    cands = sorted(cands, key=lambda c: c[0])  # (vec_id, sim, vec)
    ids = [c[0] for c in cands]
    rel = [c[1] for c in cands]
    V = np.vstack([c[2] for c in cands]).astype(np.float64)
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    S = np.round(V @ V.T, 6)
    chosen, max_sim, out = [], None, []
    for rank in range(1, min(k, len(ids)) + 1):
        best, best_key = None, None
        for i in range(len(ids)):
            if i in chosen:
                continue
            s = lam * rel[i] if not chosen else (
                lam * rel[i] - (1.0 - lam) * max_sim[i]
            )
            # np.round, not Python round: the operator 9dp-rounds with
            # numpy and the two differ by 1 ulp on .5e-9 boundaries
            key = (-float(np.round(s, 9)), ids[i])
            if best is None or key < best_key:
                best, best_key = i, key
        chosen.append(best)
        col = S[:, best]
        max_sim = col if max_sim is None else np.maximum(max_sim, col)
        out.append((rank, ids[best], round(rel[best], 6), -best_key[0]))
    return out


def test_mmr_matches_python_reference(spark, sf_dir):
    pool_rows = topk_cosine_bruteforce(
        spark, sf_dir, n_queries=5, k=50
    ).collect()
    import duckdb

    vecs = {
        vid: np.array(v, dtype=np.float64)
        for vid, v in duckdb.connect().execute(
            f"SELECT vec_id, embedding::DOUBLE[] FROM "
            f"'{sf_dir}/embeddings.parquet'"
        ).fetchall()
    }
    by_q = {}
    for r in pool_rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["sim"], vecs[r["vec_id"]])
        )
    got = {}
    for r in n2_mmr_diversified_topk(
        spark, sf_dir, n_queries=5, k=10, pool=50, lam=0.7
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["relevance"], r["mmr_score"])
        )
    assert sorted(got) == sorted(by_q)
    for q, cands in by_q.items():
        ref = [
            (rank, vid, rel, round(sc, 6))
            for rank, vid, rel, sc in _reference_mmr(cands, 10, 0.7)
        ]
        assert sorted(got[q]) == sorted(ref), q


def test_mmr_planted_near_duplicate_yields_coverage(spark, tmp_path):
    """Query along e1; candidates: two near-identical high-relevance
    vectors (1, 2) and an oblique lower-relevance one (3). Plain top-2
    keeps both duplicates; MMR at lam=0.5 must swap the duplicate for
    the oblique vector."""
    dim = 64
    # query strictly BETWEEN the duplicate direction and the diverse one
    # (a query parallel to candidate 1 would tie the MMR scores exactly:
    # sim-to-selected == relevance for every candidate)
    q = np.zeros(dim); q[0] = 0.9; q[1] = np.sqrt(1 - 0.81)
    e1 = np.zeros(dim); e1[0] = 1.0
    dup = np.zeros(dim); dup[0] = 1.0; dup[1] = -0.05
    e2 = np.zeros(dim); e2[1] = 1.0
    rows = {
        0: q,                  # the query
        1: e1,                 # best match (rel 0.9)
        2: dup / np.linalg.norm(dup),   # near-duplicate of 1 (rel ~0.88)
        3: e2,                 # diverse: rel ~0.44, orthogonal to 1
    }
    table = pa.table(
        {
            "vec_id": pa.array(list(rows), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in rows.values()],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    sf = tmp_path / "sf_mmr"
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "embeddings.parquet"))

    plain = [
        r["vec_id"]
        for r in topk_cosine_bruteforce(
            spark, str(sf), n_queries=1, k=2
        ).collect()
    ]
    assert sorted(plain) == [1, 2]  # the duplicate wastes a slot
    mmr = [
        r["vec_id"]
        for r in n2_mmr_diversified_topk(
            spark, str(sf), n_queries=1, k=2, pool=3, lam=0.5
        ).collect()
    ]
    assert mmr == [1, 3]  # slot 2 goes to coverage
