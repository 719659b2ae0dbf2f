"""Round-8 wave tests: session-path whale cap, oracle type hygiene,
and the round's new operators."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest  # noqa: F401


def _events_typed_fixture(tmp_path, rows, name="sf_evt"):
    """(user_id, event_type, second-offset) rows, base epoch + offset s."""
    base_ns = 1_700_000_000 * 1_000_000_000
    n = len(rows)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base_ns + int(r[2] * 1_000_000_000) for r in rows],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_session_path_whale_session_is_capped_not_collected(spark, tmp_path):
    """VERDICT r7 #2: an always-on bot (events every 60 s, never a
    30-min silence) is ONE session whose naive collect_list is an
    unbounded single-row array.  With the rank cap, the whale's path
    carries exactly max_events entries, truncation is reported, and
    the plan ranks BEFORE it collects (row_number + conditional
    collect_list), so the aggregation buffer is bounded."""
    from hadoop_stuff_spark.operators.temporal import session_path_topk

    whale = [(1, f"e{i % 7}", i * 60.0) for i in range(5000)]  # no gap ever
    small = [(2, "view", 0.0), (2, "click", 60.0)]
    sf = _events_typed_fixture(tmp_path, whale + small, "sf_whale")

    df = session_path_topk(spark, sf, max_events=16)
    out = {r["path"]: r for r in df.collect()}
    assert len(out) == 2
    whale_path = ">".join(f"e{i % 7}" for i in range(16))
    assert whale_path in out
    assert out[whale_path]["path_len"] == 16
    assert out[whale_path]["n_truncated"] == 1
    assert out["view>click"]["n_truncated"] == 0

    # plan shape: the rank-cap must be real — a window row_number feeds a
    # CASE-gated collect_list (nulls skipped → bounded buffer), never a
    # bare collect_list over the whole session.
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan
    assert "collect_list(case when" in plan.lower()
    assert "collect_list(struct" not in plan.lower()


def test_session_path_default_cap_matches_oracle_with_truncation(spark, tmp_path):
    """Parity is not oracle-for-default-only here: the SQL mirrors the
    rank cutoff, so a fixture that actually truncates (a 70-event
    no-gap session vs the default cap 64) must agree engine-vs-oracle
    cell for cell."""
    import duckdb

    from hadoop_stuff_spark.operators.temporal import (
        SESSION_PATH_SQL,
        session_path_topk,
    )

    rows = [(1, f"t{i % 3}", i * 60.0) for i in range(70)] + [
        (2, "view", 0.0),
        (2, "click", 60.0),
    ]
    sf = _events_typed_fixture(tmp_path, rows, "sf_trunc")
    got = sorted(tuple(r) for r in session_path_topk(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(SESSION_PATH_SQL).fetchall())
    con.close()
    assert got == want
    # and the whale row really did truncate at 64
    trunc = [r for r in got if r[1] == 64]
    assert trunc and trunc[0][3] == 1


def _docs_fixture(tmp_path, rows, name):
    """(doc_id, source, text) documents table."""
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "documents.parquet"))
    return str(sf)


def test_js_matrix_hand_computed_identical_and_disjoint(spark, tmp_path):
    """Three sources: A and C share the identical unigram distribution
    (JS = 0), A and B mirror each other (hand-computable JS), and D is
    vocabulary-disjoint from A (JS = ln 2, the upper bound)."""
    import math

    from hadoop_stuff_spark.operators.textstats import (
        source_js_divergence_matrix,
    )

    rows = [
        (0, "srcA", "a a b"),
        (1, "srcB", "a b b"),
        (2, "srcC", "a a b"),
        (3, "srcD", "x y z"),
    ]
    sf = _docs_fixture(tmp_path, rows, "sf_js")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_js_divergence_matrix(spark, sf).collect()
    }
    assert len(out) == 6
    assert out[("srcA", "srcC")]["js_nats"] == 0.0
    # JS(A,B): p=(2/3,1/3) vs q=(1/3,2/3) → symmetric:
    # 2*(0.5*(2/3·ln(4/3) + 1/3·ln(2/3)))
    want_ab = (2 / 3) * math.log(4 / 3) + (1 / 3) * math.log(2 / 3)
    assert abs(out[("srcA", "srcB")]["js_nats"] - round(want_ab, 6)) < 2e-6
    assert abs(out[("srcA", "srcD")]["js_nats"] - round(math.log(2), 6)) < 2e-6
    assert out[("srcA", "srcD")]["n_words_union"] == 5  # a,b + x,y,z


def test_js_matrix_guards_source_blowup(spark, tmp_path):
    from hadoop_stuff_spark.operators.textstats import (
        source_js_divergence_matrix,
    )

    rows = [(i, f"s{i}", "w") for i in range(5)]
    sf = _docs_fixture(tmp_path, rows, "sf_js_guard")
    import pytest as _pt

    with _pt.raises(ValueError, match="max_sources"):
        source_js_divergence_matrix(spark, sf, max_sources=4)


def test_ivf_cell_balance_accounts_for_every_vector_and_cell(spark, sf_dir):
    """The report's invariants: exactly n_cells rows (empty cells
    materialized, never dropped by the groupBy), counts sum to the
    corpus, shares to 100, load factors to n_cells."""
    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.kmeans import n2_ivf_cell_balance

    rows = n2_ivf_cell_balance(spark, sf_dir).collect()
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == 16
    assert [r["cell"] for r in rows] == list(range(16))
    assert sum(r["n_vectors"] for r in rows) == n_corpus
    assert abs(sum(r["share_pct"] for r in rows) - 100.0) < 1e-3
    assert abs(sum(r["load_factor"] for r in rows) - 16.0) < 1e-3


def test_minhash_calibration_bands_are_tight_and_in_range(spark, sf_dir):
    """Per estimated-decile band: the mean estimate lies inside the
    band, the estimator tracks the exact Jaccard within 0.1 (64 perms →
    std ≈ 0.06 at j=0.5), and bias is small — the signature is
    trustworthy on this corpus."""
    from hadoop_stuff_spark.operators.dedup import minhash_calibration

    rows = minhash_calibration(spark, sf_dir).collect()
    assert rows, "LSH candidates exist in documents by construction"
    for r in rows:
        lo, hi = r["est_band"] / 10.0, (r["est_band"] + 1) / 10.0
        assert lo <= r["mean_est"] <= hi + 1e-9
        assert r["n_pairs"] >= 1
        assert r["mean_abs_err"] < 0.1
        assert abs(r["bias"]) < 0.1
        assert 0.0 <= r["mean_exact"] <= 1.0


def test_basket_lift_hand_computed(spark, tmp_path):
    """4 baskets: parts 1+2 always together (lift = N/n_1 = 2), part 3
    popular but independent of 1 — lift highlights the real association
    that raw co-occurrence counts bury under popularity."""
    from hadoop_stuff_spark.operators.relational import basket_affinity_lift

    baskets = {
        10: [1, 2, 3],
        11: [1, 2, 3],
        12: [3, 4],
        13: [3, 4],
    }
    rows = [(o, p) for o, parts in baskets.items() for p in parts]
    table = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(rows)),
            "l_shipdate": pa.array(
                [1_700_000_000_000_000] * len(rows), pa.timestamp("us")
            ),
        }
    )
    sf = tmp_path / "sf_lift"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "lineitem.parquet"))

    out = {
        (r["part_a"], r["part_b"]): r
        for r in basket_affinity_lift(spark, str(sf), min_support=2).collect()
    }
    # pair (1,2): n_ab=2, n_1=2, n_2=2, N=4 → lift = 2*4/(2*2) = 2.0
    assert out[(1, 2)]["lift"] == 2.0
    assert out[(1, 2)]["conf_a_to_b"] == 1.0
    # pair (1,3): n_ab=2, n_1=2, n_3=4 → lift = 2*4/(2*4) = 1.0 (independent)
    assert out[(1, 3)]["lift"] == 1.0
    # pair (3,4): n_ab=2, n_3=4, n_4=2 → lift 1.0, conf_b_to_a = 1.0
    assert out[(3, 4)]["conf_b_to_a"] == 1.0


def test_near_dup_clusters_coarsen_exact_pairs_and_pick_canonicals(spark, sf_dir):
    """The production near-dup path: every exact-Jaccard pair above the
    threshold whose BOTH endpoints were LSH-recalled lands in one
    cluster; canonical picks are deterministic score-argmax with
    n_dropped = size-1."""
    from hadoop_stuff_spark.operators.clusters import n1_near_dup_clusters
    from hadoop_stuff_spark.operators.dedup import (
        minhash_near_dups,
        ngram_jaccard_pairs,
    )

    out = n1_near_dup_clusters(spark, sf_dir, threshold=0.5).collect()
    assert out, "near-dup clusters exist in documents by construction"
    assert all(r["n_dropped"] == r["cluster_size"] - 1 for r in out)
    # determinism: a second run picks identical canonicals
    again = n1_near_dup_clusters(spark, sf_dir, threshold=0.5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    # coarsening consistency: doc -> cluster map from the LSH pairs must
    # put every recalled exact pair in the same component
    lsh_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_dups(spark, sf_dir, threshold=0.5).collect()
    }
    from hadoop_stuff_spark.operators.clusters import dedup_clusters
    from hadoop_stuff_spark.operators.dedup import minhash_near_dups as _m

    members = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(
            _m(spark, sf_dir, threshold=0.5)
        ).collect()
    }
    exact = [
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
        if r["jaccard"] >= 0.5
    ]
    for a, b in exact:
        if (a, b) in lsh_pairs:  # recalled by LSH → must co-cluster
            assert members[a] == members[b]


def test_rfm_segments_partition_customers_exactly_once(spark, sf_dir):
    """Segment rollup invariants: every customer lands in exactly one
    segment (Σ n_customers = |customers with orders|), scores stay in
    [1,5], and the named segments obey their defining predicates."""
    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.relational import rfm_customer_segments

    rows = {r["segment"]: r for r in rfm_customer_segments(spark, sf_dir).collect()}
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    for r in rows.values():
        assert 1.0 <= r["avg_r"] <= 5.0
        assert 1.0 <= r["avg_f"] <= 5.0
        assert 1.0 <= r["avg_m"] <= 5.0
        assert r["total_revenue"] > 0
    if "champions" in rows:
        assert rows["champions"]["avg_r"] >= 4.0
        assert rows["champions"]["avg_f"] >= 4.0
    if "hibernating" in rows:
        assert rows["hibernating"]["avg_r"] <= 2.0


def test_ks_expfit_rejects_metronome_accepts_exponential(spark, tmp_path):
    """A metronome (constant gaps) is maximally non-exponential: its ECDF
    is a single step at the mean, so D ≈ 1 − e⁻¹ ≈ 0.632 and the test
    rejects. A genuine exponential sample (inverse-CDF over a fixed
    uniform grid) stays under the 5% critical value."""
    import math

    from hadoop_stuff_spark.operators.temporal import ks_interarrival_expfit

    rows = [(1, "tick", i * 60.0) for i in range(101)]  # 100 equal gaps
    # exponential gaps via inverse CDF on a deterministic uniform grid
    # (mean 60 s): g_k = -60 ln(1 - u_k), u_k = (k+0.5)/100
    t = 0.0
    exp_rows = [(2, "poisson", 0.0)]
    for k in range(100):
        u = (k + 0.5) / 100
        t += -60.0 * math.log(1 - u)
        exp_rows.append((2, "poisson", t))
    sf = _events_typed_fixture(tmp_path, rows + exp_rows, "sf_ks")
    out = {r["event_type"]: r for r in ks_interarrival_expfit(spark, sf).collect()}
    assert out["tick"]["reject_exponential"]
    assert abs(out["tick"]["ks_stat"] - (1 - math.exp(-1))) < 0.01
    assert not out["poisson"]["reject_exponential"]
    assert out["poisson"]["n_gaps"] == 100


def test_rfm_approx_path_is_sortless_and_partitions_everyone(spark, sf_dir):
    """exact=False replaces the three single-partition ntile sorts with
    one approx_percentile aggregate + broadcast cut comparisons: the
    physical plan carries NO window operator, every customer still lands
    in exactly one segment, and scores stay in [1, n_tiles]. Tile
    membership may differ from ntile only at cut-value ties (documented)."""
    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.relational import rfm_customer_segments

    df = rfm_customer_segments(spark, sf_dir, exact=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no ntile, no single-partition sort
    rows = df.collect()
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1.0 <= r["avg_r"] <= 5.0
        assert 1.0 <= r["avg_f"] <= 5.0
        assert 1.0 <= r["avg_m"] <= 5.0


def test_mixture_temperature_flattens_toward_uniform(spark, tmp_path):
    """τ=1 reproduces the natural share exactly (boost 1); higher τ
    moves every share toward uniform — small sources boost above 1,
    large ones shrink below — and each τ's shares still sum to 1."""
    rows = (
        [(i, "big", "w " * 99 + "w") for i in range(9)]          # 900 tokens
        + [(100, "small", "w " * 99 + "w")]                       # 100 tokens
    )
    sf = _docs_fixture(tmp_path, rows, "sf_tau")
    from hadoop_stuff_spark.operators.sampling import (
        n3_mixture_temperature_table,
    )

    out = {r["source"]: r for r in n3_mixture_temperature_table(spark, sf).collect()}
    big, small = out["big"], out["small"]
    assert big["natural_share"] == 0.9 and small["natural_share"] == 0.1
    assert big["share_tau1"] == 0.9 and big["boost_tau1"] == 1.0
    for tau in ("tau2", "tau4"):
        assert abs(big[f"share_{tau}"] + small[f"share_{tau}"] - 1.0) < 2e-6
        assert small[f"boost_{tau}"] > 1.0 > big[f"boost_{tau}"]
    # τ=4 is flatter than τ=2
    assert small["share_tau4"] > small["share_tau2"] > small["share_tau1"]


def test_split_leakage_planted_dup_across_splits(spark, tmp_path):
    """Two identical long documents whose ids hash into train and val
    respectively → the val copy is leaked; an id-distinct singleton in
    test shares no shingle with train → not leaked. Doc ids are chosen
    by probing the split hash so the fixture is stable by construction."""
    from hadoop_stuff_spark.operators.sampling import (
        n3_split_leakage_report,
        split_corpus,
    )

    # probe ids into the splits we need using the REAL splitter
    probe = spark.createDataFrame(
        [(i,) for i in range(400)], "doc_id long"
    )
    lab = {
        r["doc_id"]: r["split"]
        for r in split_corpus(
            probe, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
        ).collect()
    }
    train_id = next(i for i in range(400) if lab[i] == "train")
    val_id = next(i for i in range(400) if lab[i] == "val")
    test_id = next(i for i in range(400) if lab[i] == "test")
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (train_id, "s", shared),
        (val_id, "s", shared),                      # leaked: shingles ⊂ train
        (test_id, "s", "one two three four five"),  # disjoint: clean
    ]
    sf = _docs_fixture(tmp_path, rows, "sf_leak")
    out = {r["split"]: r for r in n3_split_leakage_report(spark, sf).collect()}
    assert out["val"]["n_leaked"] == 1 and out["val"]["leak_share"] == 1.0
    assert out["test"]["n_leaked"] == 0 and out["test"]["leak_share"] == 0.0
