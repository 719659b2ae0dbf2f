"""Round-11 wave operators: planted-fixture certification beyond the
registry-wide oracle parity sweep (which runs on the real testdata, where
the 1M default budget clips EVERY source uniformly — these fixtures force
the unclipped, clipped and zero-canonical-mass paths to diverge), plus the
stratified-bootstrap branch rules the real data never isolates."""

import hashlib
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from hadoop_stuff_spark.operators.dedup import (
    DEDUP_TOKEN_BUDGET_SQL,
    n3_dedup_aware_token_budget,
)
from hadoop_stuff_spark.operators.profile import ab_value_bootstrap_ci_by_nation


def _docs_fixture(tmp_path, docs, name="sf_w11"):
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[2] for d in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array([d[1] for d in docs]),
            "n_chars": pa.array([len(d[2]) for d in docs], pa.int64()),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "documents.parquet"))
    return str(sf)


LONG = " ".join(f"w{i}" for i in range(100))  # 100 tokens
ALLOC_FIXTURE = [
    (1, "srcA", LONG),          # canonical: srcA owns the long doc
    (2, "srcB", LONG),          # copy — canonical_id=1, srcB loses the mass
    (3, "srcB", "a b c d"),     # srcB's only canonical tokens (4)
    (4, "srcC", LONG),          # srcC is ALL copies: canonical_tokens = 0
]


def test_dedup_token_budget_clip_and_zero_canonical(spark, tmp_path):
    """budget=120, tau=2: dedup shares are exactly sqrt(100):sqrt(4):0 =
    10:2:0 over canonical tokens, so srcA draws a full unclipped epoch,
    srcB clips at max_epochs, and srcC (pure copier) is guarded to zero
    epochs/draw instead of a 0/0 NULL-vs-NaN divergence. The correction
    vs the raw-count allocator moves budget from the copiers to srcA."""
    sf = _docs_fixture(tmp_path, ALLOC_FIXTURE)
    rows = {
        r["source"]: r
        for r in n3_dedup_aware_token_budget(
            spark, sf, budget_tokens=120, tau=2.0, max_epochs=4.0
        ).collect()
    }
    a, b, c = rows["srcA"], rows["srcB"], rows["srcC"]
    assert (a["canonical_tokens"], b["canonical_tokens"], c["canonical_tokens"]) == (
        100,
        4,
        0,
    )
    # shares 10/12 and 2/12 of 120 → 100 and 20 tokens
    assert a["allocated_tokens"] == 100 and not a["clipped"]
    assert a["epochs"] == 1.0 and a["tokens_drawn"] == 100
    assert b["allocated_tokens"] == 20 and b["clipped"]
    assert b["epochs"] == 4.0 and b["tokens_drawn"] == 16  # floor(4*4)
    # the zero-canonical guard: explicit zeros, never NULL/NaN
    assert c["target_share"] == 0.0 and c["allocated_tokens"] == 0
    assert c["epochs"] == 0.0 and not c["clipped"] and c["tokens_drawn"] == 0
    # raw allocator would fund the copiers; dedup returns that budget to A
    assert a["budget_correction"] > 0
    assert b["budget_correction"] < 0 and c["budget_correction"] < 0
    assert (
        a["budget_correction"] + b["budget_correction"] + c["budget_correction"]
        <= 0 + 2  # floors may drop up to ~1 token per source
    )
    # realized shares renormalize over what was actually drawn (116)
    assert abs(sum(r["realized_share"] for r in rows.values()) - 1.0) < 1e-5
    assert a["realized_share"] == round(100 / 116, 6)


def _in_arm_a(uid):
    return hashlib.md5(f"ab1:{uid}".encode()).hexdigest()[:6] < "800000"


def test_stratified_bootstrap_planted_effects(spark, tmp_path):
    """Three planted nations: EFFECT has constant values 100 (arm A) vs 1
    (arm B) — every replicate diff is exactly 99, so the CI degenerates to
    [99, 99] and flags significant; FLAT has identical values in both arms
    — every replicate diff is exactly 0, CI [0, 0], not significant;
    THIN has one ok event per arm — excluded by the degenerate rule."""
    users = list(range(40))
    armA = [u for u in users if _in_arm_a(u)]
    armB = [u for u in users if not _in_arm_a(u)]
    # EFFECT: 5 users per arm; FLAT: 5 per arm; THIN: 1 per arm
    nation_of = {}
    for u in armA[:5] + armB[:5]:
        nation_of[u] = 0
    for u in armA[5:10] + armB[5:10]:
        nation_of[u] = 1
    nation_of[armA[10]] = 2
    nation_of[armB[10]] = 2

    eid, rows = 0, []
    for u, nk in nation_of.items():
        n_events = 1 if nk == 2 else 10
        for _ in range(n_events):
            if nk == 0:
                v = 100.0 if _in_arm_a(u) else 1.0
            else:
                v = 5.0
            rows.append((eid, 1_000_000 * eid, u, "click", v, "{}"))
            eid += 1

    sf = tmp_path / "sf_strat"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        ),
        str(sf / "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(list(nation_of), pa.int64()),
                "c_nationkey": pa.array(
                    [nation_of[u] for u in nation_of], pa.int64()
                ),
            }
        ),
        str(sf / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int64()),
                "n_name": pa.array(["EFFECT", "FLAT", "THIN"]),
            }
        ),
        str(sf / "nation.parquet"),
    )

    rows = {
        r["n_name"]: r
        for r in ab_value_bootstrap_ci_by_nation(spark, str(sf)).collect()
    }
    assert set(rows) == {"EFFECT", "FLAT"}  # THIN excluded (<2 per arm)
    eff, flat = rows["EFFECT"], rows["FLAT"]
    assert eff["mean_diff"] == 99.0
    assert eff["ci_lo"] == 99.0 and eff["ci_hi"] == 99.0
    assert eff["significant"] is True
    assert flat["mean_diff"] == 0.0
    assert flat["ci_lo"] == 0.0 and flat["ci_hi"] == 0.0
    assert flat["significant"] is False
    # constant-value arms make surviving replicates exact; with 50 draws
    # per arm the zero-total-weight drop is ~e^-50 — all 64 must survive
    assert eff["n_reps"] == 64 and flat["n_reps"] == 64


def test_dedup_token_budget_matches_duckdb_on_planted(spark, tmp_path):
    """Cross-engine pin of the guard/clip branches the real testdata never
    exercises (there every source clips identically): the certified SQL on
    the planted fixture must reproduce the engine row-for-row at the
    DEFAULT constants."""
    sf = _docs_fixture(tmp_path, ALLOC_FIXTURE, name="sf_w11_x")
    got = {
        r["source"]: r for r in n3_dedup_aware_token_budget(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    oracle = con.execute(DEDUP_TOKEN_BUDGET_SQL).fetch_arrow_table().to_pylist()
    con.close()
    assert len(oracle) == len(got) == 3
    for row in oracle:
        mine = got[row["source"]]
        for col, val in row.items():
            assert mine[col] == val, (row["source"], col, mine[col], val)


def test_user_lifecycle_weekly_planted_states(spark, tmp_path):
    """Three planted users: gaps produce resurrections and churn lands in
    the FIRST silent week; the growth-accounting identity holds row over
    row; churn past the corpus max week is excluded by the grid."""
    from hadoop_stuff_spark.operators.temporal import user_lifecycle_weekly

    US_WEEK = 7 * 86_400 * 1_000_000
    act = [(1, 0), (1, 1), (1, 3), (2, 0), (2, 1), (2, 2), (2, 3), (3, 2)]
    sf = tmp_path / "sf_life"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(act)), pa.int64()),
                "ts": pa.array(
                    [w * US_WEEK + 1 for _, w in act], pa.timestamp("us")
                ),
                "user_id": pa.array([u for u, _ in act], pa.int64()),
            }
        ),
        str(sf / "events.parquet"),
    )
    rows = {r["wk"]: r for r in user_lifecycle_weekly(spark, str(sf)).collect()}
    assert sorted(rows) == [0, 1, 2, 3]

    def cell(w):
        r = rows[w]
        return (
            r["n_new"],
            r["n_retained"],
            r["n_resurrected"],
            r["n_active"],
            r["n_churned"],
        )

    assert cell(0) == (2, 0, 0, 2, 0)
    assert cell(1) == (0, 2, 0, 2, 0)
    assert cell(2) == (1, 1, 0, 2, 1)  # user 1 churned into wk2
    assert cell(3) == (0, 1, 1, 2, 1)  # user 1 resurrected; user 3 churned
    for w in (1, 2, 3):  # growth-accounting identity
        assert rows[w]["n_active"] == (
            rows[w - 1]["n_active"]
            + rows[w]["n_new"]
            + rows[w]["n_resurrected"]
            - rows[w]["n_churned"]
        )


def test_priority_pchart_planted_spike_and_clamp(spark, tmp_path):
    """Four 100-order weeks at 20% urgent, one at 60% (out of control),
    and one 2-order week whose binomial limits must clamp to [0, 1] and
    therefore never flag."""
    from hadoop_stuff_spark.operators.temporal import (
        priority_share_control_chart,
    )

    US_DAY = 86_400 * 1_000_000
    rows = []
    for w in range(4):
        rows += [(w * 7, "1-URGENT")] * 20 + [(w * 7, "5-LOW")] * 80
    rows += [(4 * 7, "1-URGENT")] * 60 + [(4 * 7, "5-LOW")] * 40
    rows += [(5 * 7, "1-URGENT"), (5 * 7, "5-LOW")]
    sf = tmp_path / "sf_pchart"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                "o_orderdate": pa.array(
                    [d * US_DAY for d, _ in rows], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array([p for _, p in rows]),
            }
        ),
        str(sf / "orders.parquet"),
    )
    out = {
        r["wk"]: r
        for r in priority_share_control_chart(spark, str(sf)).collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4, 5]
    assert all(out[w]["out_of_control"] is False for w in range(4))
    assert out[4]["out_of_control"] is True and out[4]["share"] == 0.6
    thin = out[5]
    assert thin["ucl"] == 1.0 and thin["lcl"] == 0.0
    assert thin["out_of_control"] is False
    assert all(out[w]["center"] == round(141 / 502, 6) for w in out)


def test_source_centroid_similarity_planted_directions(spark, tmp_path):
    """Sources along the same axis read cosine 1, orthogonal axes read 0,
    and a zero-norm source is filtered from every pair (ANSI rule)."""
    from hadoop_stuff_spark.operators.similarity import (
        n2_source_centroid_similarity,
    )

    def vec(axis, scale):
        v = [0.0] * 64
        if axis is not None:
            v[axis] = scale
        return v

    emb = [
        (0, vec(0, 1.0)),
        (1, vec(0, 3.0)),  # srcA: centroid along e0
        (2, vec(0, 2.0)),  # srcB: same direction
        (3, vec(1, 5.0)),  # srcC: orthogonal
        (4, vec(None, 0.0)),  # srcD: zero-norm, must be filtered
    ]
    src = {0: "srcA", 1: "srcA", 2: "srcB", 3: "srcC", 4: "srcD"}
    sf = tmp_path / "sf_cent"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([i for i, _ in emb], pa.int64()),
                "embedding": pa.array(
                    [v for _, v in emb], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(emb), pa.int32()),
            }
        ),
        str(sf / "embeddings.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(src), pa.int64()),
                "source": pa.array([src[i] for i in src]),
            }
        ),
        str(sf / "documents.parquet"),
    )
    got = {
        (r["source_a"], r["source_b"]): r["cos_centroids"]
        for r in n2_source_centroid_similarity(spark, str(sf)).collect()
    }
    assert got == {
        ("srcA", "srcB"): 1.0,
        ("srcA", "srcC"): 0.0,
        ("srcB", "srcC"): 0.0,
    }


def test_pca_spectrum_matches_numpy_on_real_data(spark):
    """The single-pass Gram-partial path must reproduce numpy's cov+eigh
    on the collected vectors (rounded 6 dp), descending, summing to 1."""
    import numpy as np

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.similarity import n2_pca_spectrum

    sf = "/root/testdata/sf0.001"
    got = n2_pca_spectrum(spark, sf).collect()
    V = np.vstack(
        [
            np.asarray(r["embedding"], dtype="float64")
            for r in load_table(spark, sf, "embeddings").collect()
        ]
    )
    ev = np.linalg.eigvalsh(np.cov(V, rowvar=False))[::-1]
    assert len(got) == 64
    for r, lam in zip(got, ev):
        assert r["eigenvalue"] == round(float(lam), 6), (
            r["component"],
            r["eigenvalue"],
            lam,
        )
    assert got[-1]["cum_ratio"] == 1.0
    assert all(
        got[k]["eigenvalue"] >= got[k + 1]["eigenvalue"] for k in range(63)
    )


def test_pca_spectrum_planted_two_axis_variance(spark, tmp_path):
    """Four points with variance only on axes 0 (8/3) and 1 (2/3): the
    spectrum must be exactly those two eigenvalues then zeros, with
    explained ratios 0.8 / 0.2."""
    from hadoop_stuff_spark.operators.similarity import n2_pca_spectrum

    def vec(axis, scale):
        v = [0.0] * 64
        v[axis] = scale
        return v

    pts = [vec(0, 2.0), vec(0, -2.0), vec(1, 1.0), vec(1, -1.0)]
    sf = tmp_path / "sf_pca"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(pts, pa.list_(pa.float32())),
                "label": pa.array([0] * 4, pa.int32()),
            }
        ),
        str(sf / "embeddings.parquet"),
    )
    got = n2_pca_spectrum(spark, str(sf)).collect()
    assert got[0]["eigenvalue"] == round(8 / 3, 6)
    assert got[1]["eigenvalue"] == round(2 / 3, 6)
    assert all(r["eigenvalue"] == 0.0 for r in got[2:])
    assert got[0]["explained_ratio"] == 0.8
    assert got[1]["explained_ratio"] == 0.2
    assert got[1]["cum_ratio"] == 1.0


def test_jl_distortion_identical_vectors_bin_zero(spark, tmp_path):
    """Pairs of vectors with IDENTICAL direction must land in bin 0 in
    both spaces (cos 1 before and after any linear projection), and the
    histogram must cover exactly the sampled-pair count."""
    from hadoop_stuff_spark.operators.similarity import (
        n2_jl_projection_distortion,
    )

    # vec_ids chosen so every one passes the 20% md5 sample gate
    import hashlib

    ids = [
        i
        for i in range(400)
        if hashlib.md5(f"jlpairs{i}".encode()).hexdigest()[:6] < "333333"
    ][:3]
    base = [float(k % 7 - 3) for k in range(64)]
    pts = [[x * (m + 1) for x in base] for m in range(len(ids))]
    sf = tmp_path / "sf_jl"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(pts, pa.list_(pa.float32())),
                "label": pa.array([0] * len(ids), pa.int32()),
            }
        ),
        str(sf / "embeddings.parquet"),
    )
    got = n2_jl_projection_distortion(spark, str(sf)).collect()
    n_pairs = len(ids) * (len(ids) - 1) // 2
    assert sum(r["n_pairs"] for r in got) == n_pairs
    assert len(got) == 1 and got[0]["bin"] == 0 and got[0]["bin_lo"] == 0.0


def test_purchase_rate_bootstrap_planted_certain_effect(spark, tmp_path):
    """Arm A events are ALL purchases, arm B none: every replicate's rate
    diff is exactly 1.0 regardless of Poisson weights, so the CI
    degenerates to [1, 1] and flags significant."""
    from hadoop_stuff_spark.operators.profile import (
        ab_purchase_rate_bootstrap_ci,
    )

    users = list(range(30))
    armA = [u for u in users if _in_arm_a(u)][:5]
    armB = [u for u in users if not _in_arm_a(u)][:5]
    rows = []
    eid = 0
    for u in armA + armB:
        for _ in range(10):
            et = "purchase" if u in armA else "view"
            rows.append((eid, 1_000_000 * eid, u, et, 1.0, "{}"))
            eid += 1
    sf = tmp_path / "sf_rate"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        ),
        str(sf / "events.parquet"),
    )
    (row,) = ab_purchase_rate_bootstrap_ci(spark, str(sf)).collect()
    assert row["metric"] == "purchase_rate"
    assert (row["n_a"], row["n_b"]) == (50, 50)
    assert row["mean_diff"] == 1.0
    assert row["ci_lo"] == 1.0 and row["ci_hi"] == 1.0
    assert row["significant"] is True and row["n_reps"] == 64


def test_pca_spectrum_by_source_planted(spark, tmp_path):
    """Two planted sources with different axis variances: each source's
    spectrum matches the standalone operator's planted math, and a
    one-vector source is excluded (no sample covariance)."""
    from hadoop_stuff_spark.operators.similarity import (
        n2_pca_spectrum_by_source,
    )

    def vec(axis, scale):
        v = [0.0] * 64
        v[axis] = scale
        return v

    emb = [
        (0, vec(0, 2.0)),
        (1, vec(0, -2.0)),
        (2, vec(1, 1.0)),
        (3, vec(1, -1.0)),  # srcA: eigenvalues 8/3, 2/3
        (4, vec(2, 3.0)),
        (5, vec(2, -3.0)),  # srcB: single axis, eigenvalue (9+9)/(2-1) = 18
        (6, vec(0, 9.0)),  # srcC: one vector -> excluded
    ]
    src = {i: ("srcA" if i < 4 else "srcB" if i < 6 else "srcC") for i, _ in emb}
    sf = tmp_path / "sf_pcasrc"
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([i for i, _ in emb], pa.int64()),
                "embedding": pa.array(
                    [v for _, v in emb], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(emb), pa.int32()),
            }
        ),
        str(sf / "embeddings.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(src), pa.int64()),
                "source": pa.array([src[i] for i in src]),
            }
        ),
        str(sf / "documents.parquet"),
    )
    rows = n2_pca_spectrum_by_source(spark, str(sf)).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"srcA", "srcB"}
    a = sorted(by_src["srcA"], key=lambda r: r["component"])
    assert a[0]["eigenvalue"] == round(8 / 3, 6)
    assert a[1]["eigenvalue"] == round(2 / 3, 6)
    assert a[0]["explained_ratio"] == 0.8 and a[1]["cum_ratio"] == 1.0
    b = sorted(by_src["srcB"], key=lambda r: r["component"])
    assert b[0]["eigenvalue"] == 18.0 and b[0]["explained_ratio"] == 1.0
    assert all(r["eigenvalue"] == 0.0 for r in b[1:])
