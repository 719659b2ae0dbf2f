"""Property tests for the round-7 wave-A statistical profiling operators:
Pearson/Spearman correlation, chi-square independence, MAD robust
outliers, and month-over-month growth — semantics pinned on constructed
inputs (oracle parity is covered by tests/test_oracle_parity.py)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _lineitem_fixture(tmp_path, rows, name="sf_li"):
    """(l_returnflag, l_quantity, l_extendedprice, l_discount) rows."""
    table = pa.table(
        {
            "l_orderkey": pa.array(range(len(rows)), pa.int64()),
            "l_returnflag": pa.array([r[0] for r in rows]),
            "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
            "l_discount": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "lineitem.parquet"))
    return str(sf)


def _orders_fixture(tmp_path, rows, name="sf_ord"):
    """(o_orderpriority, o_totalprice, o_orderdate iso-day) rows."""
    import datetime as dt

    table = pa.table(
        {
            "o_orderkey": pa.array(range(len(rows)), pa.int64()),
            "o_orderpriority": pa.array([r[0] for r in rows]),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [
                    int(
                        dt.datetime.strptime(r[2], "%Y-%m-%d")
                        .replace(tzinfo=dt.timezone.utc)
                        .timestamp()
                    )
                    * 1_000_000_000
                    for r in rows
                ],
                pa.timestamp("ns"),
            ),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "orders.parquet"))
    return str(sf)


def _events_fixture(tmp_path, rows, name="sf_ev"):
    """(event_type, iso-day) rows at 12:00 UTC."""
    import datetime as dt

    ns = [
        int(
            dt.datetime.strptime(d, "%Y-%m-%d")
            .replace(hour=12, tzinfo=dt.timezone.utc)
            .timestamp()
        )
        * 1_000_000_000
        for _, d in rows
    ]
    n = len(rows)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ns, pa.timestamp("ns")),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_pearson_perfect_and_degenerate(spark, tmp_path):
    """y = 2x + 3 → r = 1; y = -x → r = -1; constant y → NULL (zero
    variance is undefined, not a crash)."""
    from hadoop_stuff_spark.operators.profile import corr_price_quantity_by_flag

    rows = (
        [("POS", float(i), 2.0 * i + 3.0, 0.0) for i in range(1, 11)]
        + [("NEG", float(i), 100.0 - i, 0.0) for i in range(1, 11)]
        + [("FLAT", float(i), 7.0, 0.0) for i in range(1, 11)]
    )
    # fixture maps (flag, quantity, extendedprice, discount)
    sf = _lineitem_fixture(tmp_path, rows, "sf_corr")
    out = {r["l_returnflag"]: r for r in corr_price_quantity_by_flag(spark, sf).collect()}
    assert out["POS"]["pearson_r"] == pytest.approx(1.0)
    assert out["NEG"]["pearson_r"] == pytest.approx(-1.0)
    assert out["FLAT"]["pearson_r"] is None


def test_spearman_monotone_nonlinear_and_ties(spark, tmp_path):
    """y = x³ is monotone → rho = 1 exactly even though Pearson < 1;
    heavy ties (few distinct discounts) stay well-defined via average
    ranks and land in [-1, 1]."""
    from hadoop_stuff_spark.operators.profile import (
        corr_price_quantity_by_flag,
        spearman_quantity_discount,
    )

    cubic = [("C", float(i), 1.0, float(i**3)) for i in range(1, 21)]
    tied = [("T", float(i), 1.0, float(i % 3) / 100.0) for i in range(1, 31)]
    sf = _lineitem_fixture(tmp_path, cubic + tied, "sf_rho")
    out = {r["l_returnflag"]: r for r in spearman_quantity_discount(spark, sf).collect()}
    assert out["C"]["spearman_rho"] == pytest.approx(1.0)
    assert -1.0 <= out["T"]["spearman_rho"] <= 1.0
    # the same cubic data's PEARSON (price vs quantity is linear here, so
    # use the discount-vs-quantity shape indirectly): rho=1 ≠ r — pin that
    # Spearman saw through the nonlinearity on the cubic group
    pear = {
        r["l_returnflag"]: r for r in corr_price_quantity_by_flag(spark, sf).collect()
    }
    assert pear["C"]["pearson_r"] is None  # price constant in the fixture


def test_chi2_independent_grid_is_zero(spark, tmp_path):
    """A perfectly balanced type × weekday grid has O == E everywhere →
    every contribution and the total are exactly 0."""
    from hadoop_stuff_spark.operators.profile import chi2_event_type_dow

    # 7 consecutive days (one per weekday) × 2 types × same count
    days = [f"2026-03-{d:02d}" for d in range(2, 9)]  # Mon..Sun
    rows = [(t, d) for t in ["a", "b"] for d in days for _ in range(3)]
    sf = _events_fixture(tmp_path, rows, "sf_chi_ind")
    out = chi2_event_type_dow(spark, sf).collect()
    assert len(out) == 14
    assert all(r["chi2_contrib"] == 0.0 for r in out)
    assert all(r["chi2_total"] == 0.0 for r in out)


def test_chi2_detects_dependence(spark, tmp_path):
    """Type 'a' only on Mondays, 'b' only on Tuesdays → large chi2, and
    chi2_total is the same value on every row (a true grand total)."""
    from hadoop_stuff_spark.operators.profile import chi2_event_type_dow

    rows = [("a", "2026-03-02")] * 10 + [("b", "2026-03-03")] * 10
    sf = _events_fixture(tmp_path, rows, "sf_chi_dep")
    out = chi2_event_type_dow(spark, sf).collect()
    # the FULL 2x2 grid materializes, including the two zero cells whose
    # contributions a naive groupBy would drop (halving chi2)
    assert len(out) == 4
    assert sum(1 for r in out if r["n_obs"] == 0) == 2
    totals = {r["chi2_total"] for r in out}
    assert len(totals) == 1
    assert totals.pop() == pytest.approx(20.0)  # 2x2 fully-separated: N


def test_mad_flags_what_classical_z_cannot(spark, tmp_path):
    """n=5 with one huge outlier: classical |z| is bounded by
    (n-1)/sqrt(n) = 1.789 < 2.0 so the z-score report misses it, but the
    robust MAD z flags it — the raison d'être of this operator."""
    from hadoop_stuff_spark.operators.profile import (
        mad_outlier_orders,
        outlier_orders_by_zscore,
    )

    rows = [("X", 10.0, "2026-01-01"), ("X", 11.0, "2026-01-02"),
            ("X", 10.5, "2026-01-03"), ("X", 9.5, "2026-01-04"),
            ("X", 500.0, "2026-01-05")]
    sf = _orders_fixture(tmp_path, rows, "sf_mad")
    (z,) = outlier_orders_by_zscore(spark, sf).collect()
    assert z["n_outliers"] == 0  # masked: the outlier inflates the stddev
    (m,) = mad_outlier_orders(spark, sf).collect()
    assert m["n_outliers"] == 1
    assert m["median_price"] == 10.5
    assert m["max_robust_z"] > 100


def test_mad_zero_mad_class_is_null(spark, tmp_path):
    """Majority-constant class: MAD = 0 → NULL robust z, 0 outliers, no
    ANSI crash."""
    from hadoop_stuff_spark.operators.profile import mad_outlier_orders

    rows = [("K", 5.0, "2026-01-01")] * 6 + [("K", 9.0, "2026-01-02")]
    sf = _orders_fixture(tmp_path, rows, "sf_mad0")
    (m,) = mad_outlier_orders(spark, sf).collect()
    assert m["mad"] == 0.0
    assert m["n_outliers"] == 0
    assert m["max_robust_z"] is None


def test_mom_growth_hand_computed_with_gap(spark, tmp_path):
    """100 → 150 (+0.5) → gap month → 75 (growth vs previous OBSERVED
    month = -0.5); first month NULL."""
    from hadoop_stuff_spark.operators.temporal import mom_revenue_growth

    rows = [
        ("P", 100.0, "2026-01-10"),
        ("P", 150.0, "2026-02-10"),
        ("P", 75.0, "2026-04-10"),  # march missing entirely
    ]
    sf = _orders_fixture(tmp_path, rows, "sf_mom")
    out = mom_revenue_growth(spark, sf).collect()
    assert [str(r["month"]) for r in out] == ["2026-01-01", "2026-02-01", "2026-04-01"]
    assert out[0]["mom_growth"] is None
    assert out[1]["mom_growth"] == pytest.approx(0.5)
    assert out[2]["mom_growth"] == pytest.approx(-0.5)
    assert [r["revenue"] for r in out] == [100.0, 150.0, 75.0]


def _docs_fixture(tmp_path, rows, name="sf_docs"):
    """(source, text) rows; doc_id/lang/n_chars filled in."""
    table = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[0] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "documents.parquet"))
    return str(sf)


def test_unigram_kl_zero_for_identical_distribution(spark, tmp_path):
    """Two sources with IDENTICAL unigram distributions: each source's
    distribution equals the corpus mix, so KL = 0 exactly; a skewed third
    source gets strictly positive KL (Gibbs' inequality)."""
    from hadoop_stuff_spark.operators.textstats import n3_unigram_kl_by_source

    same = "a a b c"
    rows = [("s1", same), ("s2", same)]
    sf = _docs_fixture(tmp_path, rows, "sf_kl0")
    out = {r["source"]: r for r in n3_unigram_kl_by_source(spark, sf).collect()}
    assert out["s1"]["kl_vs_corpus"] == 0.0
    assert out["s2"]["kl_vs_corpus"] == 0.0

    rows = [("s1", "a a a a"), ("s2", "b b b b"), ("s3", "a b a b")]
    sf = _docs_fixture(tmp_path, rows, "sf_klpos")
    out = {r["source"]: r for r in n3_unigram_kl_by_source(spark, sf).collect()}
    assert out["s1"]["kl_vs_corpus"] > 0
    assert out["s2"]["kl_vs_corpus"] > 0
    # s1 and s2 are symmetric mirror images: identical divergence
    assert out["s1"]["kl_vs_corpus"] == out["s2"]["kl_vs_corpus"]
    # the mixed source sits closest to the corpus mix
    assert out["s3"]["kl_vs_corpus"] < out["s1"]["kl_vs_corpus"]


def test_hapax_and_ttr_hand_computed(spark, tmp_path):
    """'a a b c' → vocab 3, hapax {b, c} → share 2/3, TTR 3/4; an
    all-repeats source → hapax 0."""
    from hadoop_stuff_spark.operators.textstats import n3_hapax_ratio_by_source

    rows = [("rich", "a a b c"), ("flat", "x x x x")]
    sf = _docs_fixture(tmp_path, rows, "sf_hapax")
    out = {r["source"]: r for r in n3_hapax_ratio_by_source(spark, sf).collect()}
    assert out["rich"]["vocab_size"] == 3
    assert out["rich"]["hapax_count"] == 2
    assert out["rich"]["hapax_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["rich"]["type_token_ratio"] == 0.75
    assert out["flat"]["hapax_count"] == 0
    assert out["flat"]["type_token_ratio"] == 0.25


def test_token_length_profile_hand_computed(spark, tmp_path):
    """Known token lengths: 'ab a abcdefghij xyz' → mean 4.75, short 2/4,
    long 1/4, max 10."""
    from hadoop_stuff_spark.operators.textstats import n3_token_length_profile

    sf = _docs_fixture(tmp_path, [("s", "ab a abcdefghij xyz")], "sf_toklen")
    (r,) = n3_token_length_profile(spark, sf).collect()
    assert r["n_tokens"] == 4
    assert r["mean_len"] == pytest.approx((2 + 1 + 10 + 3) / 4)
    assert r["short_share"] == 0.5
    assert r["long_share"] == 0.25
    assert r["max_len"] == 10


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


def test_burstiness_metronome_vs_burst(spark, tmp_path):
    """Perfectly regular gaps → σ=0 → CV 0, B = -1; a bursty user
    (many tiny gaps + one huge one) → B > 0; single-gap users are
    excluded from the ratio columns (n_gaps >= 2)."""
    from hadoop_stuff_spark.operators.temporal import user_burstiness

    rows = (
        [(1, "t", i * 60.0) for i in range(10)]  # metronome: 60 s gaps
        + [(2, "t", t) for t in [0, 1, 2, 3, 4, 100000]]  # bursty
        + [(3, "t", 0.0), (3, "t", 50.0)]  # single gap
    )
    sf = _events_typed_fixture(tmp_path, rows, "sf_burst")
    out = {r["user_id"]: r for r in user_burstiness(spark, sf).collect()}
    assert out[1]["cv_gap"] == 0.0
    assert out[1]["burstiness"] == -1.0
    assert out[1]["mean_gap_s"] == 60.0
    # B is bounded by (sqrt(n-1)-1)/(sqrt(n-1)+1) = 1/3 at n_gaps=5; the
    # constructed burst hits that bound to 5 dp
    assert out[2]["burstiness"] == pytest.approx(1 / 3, abs=1e-4)
    assert out[3]["n_gaps"] == 1
    assert out[3]["cv_gap"] is None and out[3]["burstiness"] is None


def test_first_touch_vs_last_touch_semantics(spark, tmp_path):
    """User sees view → click → purchase: FIRST touch credits the view
    (last-touch would credit the click); a touch AFTER the purchase never
    counts; a touchless purchaser lands in 'none'."""
    from hadoop_stuff_spark.operators.temporal import first_touch_attribution

    rows = [
        (1, "view", 0.0),
        (1, "click", 3600.0),
        (1, "purchase", 7200.0),  # first touch = view, 2 h to convert
        (2, "purchase", 100.0),
        (2, "click", 200.0),  # too late: after the purchase
    ]
    sf = _events_typed_fixture(tmp_path, rows, "sf_touch")
    out = {r["first_touch_type"]: r for r in first_touch_attribution(spark, sf).collect()}
    assert set(out) == {"view", "none"}
    assert out["view"]["n_purchases"] == 1
    assert out["view"]["avg_hours_to_convert"] == 2.0
    assert out["none"]["n_purchases"] == 1
    assert out["none"]["avg_hours_to_convert"] is None


def test_decile_lift_lorenz_properties(spark, sf_dir):
    """Structural invariants of the Lorenz table: 10 deciles, shares sum
    to 1, cumulative share is monotone ending at 1, and decile 1 (the
    biggest spenders) carries at least the uniform share."""
    from hadoop_stuff_spark.operators.profile import order_value_decile_lift

    rows = order_value_decile_lift(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["revenue_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b for a, b in zip(cums, cums[1:]))
    assert cums[-1] == pytest.approx(1.0, abs=1e-6)
    assert rows[0]["revenue_share"] >= 0.1  # top decile >= uniform


def test_shingle_df_profile_bands_are_exact_log2(spark, tmp_path):
    """Constructed dfs hit band boundaries exactly: a shingle in 1 doc →
    band 0, in 2 and 3 docs → band 1, in 4 docs → band 2 — integer
    binary-length banding, immune to log2 ulp."""
    from hadoop_stuff_spark.operators.dedup import shingle_df_profile

    # each doc contributes its distinct 3-shingles; craft overlap counts:
    # 'a b c' appears in 4 docs (band 2); 'x y z' in 2 (band 1);
    # 'p q r' in 1 (band 0)
    rows = (
        [("s", "a b c")] * 4 + [("s", "x y z")] * 2 + [("s", "p q r")]
    )
    sf = _docs_fixture(tmp_path, rows, "sf_dfprof")
    out = {r["df_band"]: r for r in shingle_df_profile(spark, sf).collect()}
    assert out[0]["n_shingles"] == 1 and out[0]["band_lo"] == 1
    assert out[1]["n_shingles"] == 1 and out[1]["band_lo"] == 2
    assert out[2]["n_shingles"] == 1 and out[2]["band_lo"] == 4
    assert out[2]["max_df"] == 4
    # postings shares: 1/7, 2/7, 4/7
    assert out[2]["postings_share"] == pytest.approx(4 / 7, abs=1e-6)


def test_novelty_curve_duplicate_tail_scores_zero(spark, tmp_path):
    """First docs are all-novel (novelty 1); exact copies appended later
    contribute 0 novelty — the curve must fall to 0 for the copy tail."""
    from hadoop_stuff_spark.operators.dedup import novelty_curve

    fresh = [("s", f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(0, 40, 4)]
    copies = [("s", "w0 w1 w2 w3")] * 10  # exact dup of doc 0's shingles
    sf = _docs_fixture(tmp_path, fresh + copies, "sf_novel")
    rows = novelty_curve(spark, sf).collect()
    assert rows[0]["avg_novelty"] == 1.0  # earliest decile: all novel
    assert rows[-1]["avg_novelty"] == 0.0  # the copy tail: nothing new


def test_knn_label_agreement_separable_space(spark, tmp_path):
    """Perfectly separable toy embedding space (two orthogonal label
    clusters): k-NN accuracy must be 1.0 for both labels."""
    import numpy as np

    from hadoop_stuff_spark.operators.similarity import n2_knn_label_agreement

    rng = np.random.default_rng(7)
    vecs, labels = [], []
    for i in range(200):
        lab = i % 2
        base = np.zeros(8)
        base[lab * 4] = 10.0  # orthogonal cluster axes
        vecs.append((base + rng.normal(0, 0.1, 8)).astype(np.float32))
        labels.append(lab)
    table = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    sf = tmp_path / "sf_knn"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "embeddings.parquet"))
    # sample_mod=3 so the modular sample hits BOTH parity-assigned labels
    # (the default 40 would only ever sample even ids = label 0 here)
    out = {
        r["label"]: r
        for r in n2_knn_label_agreement(spark, str(sf), sample_mod=3).collect()
    }
    assert set(out) == {0, 1}
    assert out[0]["knn_accuracy"] == 1.0
    assert out[1]["knn_accuracy"] == 1.0
    assert out[0]["n_queries"] + out[1]["n_queries"] == 67  # ceil(200/3)


def test_dau_moving_average_and_wow(spark, tmp_path):
    """14 contiguous days, DAU doubling in week 2: ma7 averages the
    trailing window (shorter at the head) and wow_change is exactly 1.0
    for every week-2 day."""
    from hadoop_stuff_spark.operators.temporal import daily_active_users

    rows = []
    uid = 0
    for d in range(14):
        day = f"2026-03-{d+2:02d}"
        n_users = 2 if d < 7 else 4
        for _ in range(n_users):
            rows.append((uid, "t", d * 86400.0 + uid * 0.001))
            uid += 1
    sf = _events_typed_fixture(tmp_path, rows, "sf_dau")
    out = daily_active_users(spark, sf).collect()
    assert len(out) == 14
    assert all(r["dau"] == 2 for r in out[:7])
    assert all(r["dau"] == 4 for r in out[7:])
    assert out[0]["dau_ma7"] == 2.0  # head window of 1
    assert out[6]["dau_ma7"] == 2.0
    assert out[13]["dau_ma7"] == 4.0
    assert all(r["wow_change"] is None for r in out[:7])
    assert all(r["wow_change"] == 1.0 for r in out[7:])


def test_referential_integrity_finds_planted_orphans(spark, tmp_path):
    """A miniature star schema with two planted orphan lineitems (bad
    orderkey, bad partkey) and one orphan order (bad custkey): each edge
    reports exactly its own orphans."""
    sf = tmp_path / "sf_ri"
    os.makedirs(sf)

    def w(name, cols):
        pq.write_table(pa.table(cols), str(sf / f"{name}.parquet"))

    w("region", {"r_regionkey": pa.array([0], pa.int32()),
                 "r_name": pa.array(["r"])})
    w("nation", {"n_nationkey": pa.array([0], pa.int32()),
                 "n_regionkey": pa.array([0], pa.int32()),
                 "n_name": pa.array(["n"])})
    w("customer", {"c_custkey": pa.array([1, 2], pa.int64()),
                   "c_nationkey": pa.array([0, 0], pa.int32())})
    w("supplier", {"s_suppkey": pa.array([1], pa.int64()),
                   "s_nationkey": pa.array([0], pa.int32())})
    w("part", {"p_partkey": pa.array([1], pa.int64())})
    w("orders", {"o_orderkey": pa.array([10, 11], pa.int64()),
                 "o_custkey": pa.array([1, 99], pa.int64())})  # 99: orphan
    w("lineitem", {
        "l_orderkey": pa.array([10, 10, 77, 10], pa.int64()),  # 77: orphan
        "l_partkey": pa.array([1, 88, 1, None], pa.int64()),   # 88: orphan; NULL: missing-data class
        "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
    })

    from hadoop_stuff_spark.operators.quality import referential_integrity_report

    out = {
        (r["child_table"], r["fk_column"]): r
        for r in referential_integrity_report(spark, str(sf)).collect()
    }
    assert out[("lineitem", "l_orderkey")]["n_orphans"] == 1
    assert out[("lineitem", "l_partkey")]["n_orphans"] == 1
    assert out[("lineitem", "l_suppkey")]["n_orphans"] == 0
    assert out[("orders", "o_custkey")]["n_orphans"] == 1
    assert out[("nation", "n_regionkey")]["n_orphans"] == 0
    # ADVICE r8: the planted NULL l_partkey is reported as missing data,
    # NOT as an orphan (the never-matching NULL join key used to conflate
    # the two defect classes)
    assert out[("lineitem", "l_partkey")]["n_null_fks"] == 1
    assert sum(r["n_null_fks"] for r in out.values()) == 1
    assert all(r["n_child_rows"] > 0 for r in out.values())


def test_duplicate_key_report_counts_dups_and_nulls_separately(spark, tmp_path):
    """Planted double-delivery (one orderkey twice) and a NULL key: the
    dup count excludes the NULL class and the NULL count excludes dups."""
    sf = tmp_path / "sf_dk"
    os.makedirs(sf)

    def w(name, cols):
        pq.write_table(pa.table(cols), str(sf / f"{name}.parquet"))

    w("orders", {"o_orderkey": pa.array([1, 1, 2, None], pa.int64())})
    # the other six audited tables: clean single rows
    w("customer", {"c_custkey": pa.array([1], pa.int64())})
    w("documents", {"doc_id": pa.array([1], pa.int64())})
    w("embeddings", {"vec_id": pa.array([1], pa.int64())})
    w("events", {"event_id": pa.array([1], pa.int64())})
    w("part", {"p_partkey": pa.array([1], pa.int64())})
    w("supplier", {"s_suppkey": pa.array([1], pa.int64())})

    from hadoop_stuff_spark.operators.quality import duplicate_key_report

    out = {r["table_name"]: r for r in duplicate_key_report(spark, str(sf)).collect()}
    o = out["orders"]
    assert (o["n_rows"], o["n_keys"]) == (4, 2)
    assert o["n_dup_keys"] == 1
    assert o["max_multiplicity"] == 2
    assert o["n_null_keys"] == 1
    assert out["customer"]["n_dup_keys"] == 0


def test_boilerplate_ngrams_cross_source_only(spark, tmp_path):
    """The shared template 5-gram (in both sources) surfaces; the n-gram
    repeated many times but confined to ONE source does not."""
    from hadoop_stuff_spark.operators.cleaning import boilerplate_ngrams

    template = "all rights reserved by corp"
    rows = (
        [("s1", f"{template} alpha beta gamma delta")] * 3
        + [("s2", f"{template} eps zeta eta theta")] * 3
        + [("s1", "one source only phrase here")] * 5
    )
    sf = _docs_fixture(tmp_path, rows, "sf_boiler")
    out = boilerplate_ngrams(spark, sf).collect()
    grams = {r["ngram"]: r for r in out}
    assert template in grams
    assert grams[template]["df"] == 6
    assert grams[template]["n_sources"] == 2
    assert "one source only phrase here" not in grams
    # top entry is the highest-df cross-source gram
    assert out[0]["df"] == max(r["df"] for r in out)


def test_norm_outliers_flags_broken_embedding(spark, tmp_path):
    """One near-zero vector among unit-norm vectors of the same label:
    flagged; a clean label reports 0 with NULL-safe MAD handling."""
    from hadoop_stuff_spark.operators.similarity import n2_norm_outliers

    import numpy as np

    rng = np.random.default_rng(3)
    vecs, labels = [], []
    for i in range(30):
        v = rng.normal(0, 1, 8)
        v = v / np.linalg.norm(v) * (1.0 + rng.normal(0, 0.01))
        vecs.append(v)
        labels.append(0)
    vecs.append(np.zeros(8) + 1e-6)  # the broken encode
    labels.append(0)
    for i in range(10):
        v = rng.normal(0, 1, 8)
        vecs.append(v / np.linalg.norm(v))
        labels.append(1)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    sf = tmp_path / "sf_norm"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "embeddings.parquet"))
    out = {r["label"]: r for r in n2_norm_outliers(spark, str(sf)).collect()}
    assert out[0]["n_outliers"] == 1
    assert out[0]["median_norm"] == pytest.approx(1.0, abs=0.05)
    # label 1 is exactly unit-norm: MAD 0 -> NULL z, no crash, 0 outliers
    assert out[1]["n_outliers"] == 0


def test_knn_zero_norm_vector_excluded_both_engines(spark, tmp_path):
    """Review regression (live-repro'd): one all-zero embedding crashed
    Spark with an ANSI DIVIDE_BY_ZERO while the DuckDB oracle silently
    returned rows (list_cosine_similarity yields -1.0). Both engines now
    exclude zero-norm vectors and agree."""
    import duckdb
    import numpy as np

    from hadoop_stuff_spark.operators.similarity import (
        KNN_LABEL_SQL,
        n2_knn_label_agreement,
    )

    rng = np.random.default_rng(11)
    vecs = [list(map(float, rng.normal(0, 1, 8))) for _ in range(119)]
    vecs.append([0.0] * 8)  # vec_id 119: the failed encode
    table = pa.table(
        {
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 2 for i in range(120)], pa.int32()),
        }
    )
    sf = tmp_path / "sf_knn0"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "embeddings.parquet"))

    got = sorted(
        tuple(r) for r in n2_knn_label_agreement(spark, str(sf)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(KNN_LABEL_SQL).fetchall())
    assert got == want
    assert got  # queries survived the zero-norm cut


def test_scaling_factor_bounds_rejected():
    """Review regression: factor > 26 would push the replica suffix past
    'z' into clean_text-stripped chars, re-colliding replica shingles."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from make_scaling_sf import build

    with pytest.raises(ValueError, match="factor"):
        build(0)
    with pytest.raises(ValueError, match="factor"):
        build(27)


def test_session_path_topk_splits_on_gap_and_orders_in_session(spark, tmp_path):
    """One user, two sessions split by a >30-min gap; paths are built in
    (ts, event_id) order; counts aggregate across users."""
    from hadoop_stuff_spark.operators.temporal import session_path_topk

    rows = [
        (1, "view", 0.0), (1, "click", 60.0), (1, "purchase", 120.0),
        (1, "view", 10000.0),  # 2nd session: gap >> 30 min
        (2, "view", 0.0), (2, "click", 60.0), (2, "purchase", 120.0),
    ]
    sf = _events_typed_fixture(tmp_path, rows, "sf_paths")
    out = {r["path"]: r for r in session_path_topk(spark, sf).collect()}
    assert out["view>click>purchase"]["n_sessions"] == 2
    assert out["view>click>purchase"]["path_len"] == 3
    assert out["view"]["n_sessions"] == 1


def test_weekly_cohort_ltv_hand_computed(spark, tmp_path):
    """Two users in one Monday-anchored cohort week; purchases of 10 and
    30 in week 0 and 20 in week 1 → cum LTV per user 20.0 then 30.0."""
    from hadoop_stuff_spark.operators.temporal import weekly_cohort_ltv

    # base epoch 1_700_000_000 = Tue 2023-11-14; week starts Mon 11-13
    rows = [
        (1, "signup", 0.0),
        (2, "signup", 3600.0),
        (1, "purchase", 7200.0),       # week 0
        (2, "purchase", 86400.0),      # week 0
        (1, "purchase", 8 * 86400.0),  # week 1
    ]
    sf = _events_typed_fixture(tmp_path, rows, "sf_ltv")
    # the typed fixture writes value=1.0 for all rows; rewrite values
    import pyarrow.parquet as pq2

    t = pq2.read_table(f"{sf}/events.parquet")
    vals = [1.0, 1.0, 10.0, 30.0, 20.0]
    t = t.set_column(
        t.schema.get_field_index("value"), "value", pa.array(vals, pa.float64())
    )
    pq2.write_table(t, f"{sf}/events.parquet")

    out = weekly_cohort_ltv(spark, sf).collect()
    assert len(out) == 2
    w0, w1 = out
    assert (w0["week_index"], w1["week_index"]) == (0, 1)
    assert w0["n_users"] == 2
    assert w0["revenue"] == 40.0
    assert w0["cum_ltv_per_user"] == 20.0
    assert w1["revenue"] == 20.0
    assert w1["cum_ltv_per_user"] == 30.0


def test_bigram_entropy_deterministic_vs_branching(spark, tmp_path):
    """'a b a b ...' has fully deterministic transitions → 0 bits;
    'a b a c a b a c' branches 50/50 after 'a' → 4/7 bits exactly."""
    from hadoop_stuff_spark.operators.lm import n3_bigram_entropy_rate

    rows = [("det", "a b a b a b a b"), ("branch", "a b a c a b a c")]
    sf = _docs_fixture(tmp_path, rows, "sf_ent")
    out = {r["source"]: r for r in n3_bigram_entropy_rate(spark, sf).collect()}
    assert out["det"]["entropy_bits"] == 0.0
    # branch: 7 bigrams, prefix 'a' occurs 4x with H=1 bit, b/c prefixes
    # deterministic -> total = 4/7
    assert out["branch"]["n_bigrams"] == 7
    assert out["branch"]["entropy_bits"] == pytest.approx(4 / 7, abs=1e-6)


def test_dup_group_size_histogram_planted_bands(spark, tmp_path):
    """Group sizes 1, 2, and 4 land in bands 0, 1, 2; n_removable is
    exactly the dedup deletion count."""
    from hadoop_stuff_spark.operators.dedup import dup_group_size_histogram

    rows = (
        [("s", "unique one")] + [("s", "pair text")] * 2 + [("s", "viral text")] * 4
    )
    sf = _docs_fixture(tmp_path, rows, "sf_dupsz")
    out = {r["size_band"]: r for r in dup_group_size_histogram(spark, sf).collect()}
    assert out[0]["n_groups"] == 1 and out[0]["n_removable"] == 0
    assert out[1]["n_groups"] == 1 and out[1]["n_removable"] == 1
    assert out[2]["n_groups"] == 1 and out[2]["n_removable"] == 3
    assert sum(r["doc_share"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)


def test_fulfillment_lag_hand_computed(spark, tmp_path):
    """Three lineitems at 10/20/40 day lags: p50 = 20, max = 40, and the
    within-30d share counts exactly two of three."""
    import datetime as dt

    sf = tmp_path / "sf_lag"
    os.makedirs(sf)

    def day_ns(d):
        return (
            int(
                dt.datetime.strptime(d, "%Y-%m-%d")
                .replace(tzinfo=dt.timezone.utc)
                .timestamp()
            )
            * 1_000_000_000
        )

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_orderpriority": pa.array(["P"]),
                "o_orderdate": pa.array([day_ns("2026-01-01")], pa.timestamp("ns")),
            }
        ),
        str(sf / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 1], pa.int64()),
                "l_shipdate": pa.array(
                    [day_ns("2026-01-11"), day_ns("2026-01-21"), day_ns("2026-02-10")],
                    pa.timestamp("ns"),
                ),
            }
        ),
        str(sf / "lineitem.parquet"),
    )
    from hadoop_stuff_spark.operators.relational import order_fulfillment_lag

    (r,) = order_fulfillment_lag(spark, str(sf)).collect()
    assert r["p50_days"] == 20.0
    assert r["max_days"] == 40
    assert r["within_30d_share"] == pytest.approx(2 / 3, abs=1e-6)


def test_basket_size_shares_sum_to_one(spark, sf_dir):
    from hadoop_stuff_spark.operators.relational import basket_size_distribution

    rows = basket_size_distribution(spark, sf_dir).collect()
    assert sum(r["order_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert all(r["basket_size"] >= 1 for r in rows)
    assert all(r["total_value"] > 0 for r in rows)


def test_repeat_purchase_interval_ordinals(spark, tmp_path):
    """User with purchases at days 0, 10, 40: repeat 1 gap = 10 d,
    repeat 2 gap = 30 d; single-purchase users contribute nothing."""
    from hadoop_stuff_spark.operators.temporal import repeat_purchase_interval

    rows = [
        (1, "purchase", 0.0),
        (1, "purchase", 10 * 86400.0),
        (1, "purchase", 40 * 86400.0),
        (2, "purchase", 5.0),  # lone purchase: no gap rows
        (3, "view", 0.0),      # non-purchase: ignored
    ]
    sf = _events_typed_fixture(tmp_path, rows, "sf_repeat")
    out = {r["repeat_number"]: r for r in repeat_purchase_interval(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1]["median_gap_days"] == 10.0
    assert out[2]["median_gap_days"] == 30.0
    assert out[1]["n_users"] == 1


def test_langid_confusion_known_languages(spark, tmp_path):
    """Constructed docs in the classifier's marker languages land on the
    diagonal; a language outside its marker set (zh-labeled doc with no
    markers) can only predict 'und' — the honest failure mode."""
    from hadoop_stuff_spark.operators.textstats import langid_confusion_matrix

    rows = [
        ("en", "the cat is of the house and a dog"),
        ("en", "a list of the items and the rest is here"),
        ("de", "der hund ist von der frau und die katze"),
        ("zh", "zhongwen wenben meiyou biaoji cihui"),
    ]
    # _docs_fixture signature is (source, text); build a lang-typed table
    table = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[0] for r in rows]),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    sf = tmp_path / "sf_conf"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "documents.parquet"))
    out = {
        (r["actual_lang"], r["pred_lang"]): r
        for r in langid_confusion_matrix(spark, str(sf)).collect()
    }
    assert out[("en", "en")]["n_docs"] == 2
    assert out[("en", "en")]["actual_share"] == 1.0
    assert out[("de", "de")]["n_docs"] == 1
    assert ("zh", "und") in out  # outside the marker set: honest 'und'


def test_dedup_vocab_impact_duplicates_remove_tokens_not_vocab(spark, tmp_path):
    """Three copies of one doc + one unique doc: dedup removes 2/3 of the
    duplicated tokens but zero vocabulary (the operator's whole point)."""
    from hadoop_stuff_spark.operators.textstats import dedup_vocab_impact

    rows = [("s", "alpha beta gamma")] * 3 + [("s", "delta eps")]
    sf = _docs_fixture(tmp_path, rows, "sf_vocimp")
    (r,) = dedup_vocab_impact(spark, sf).collect()
    assert r["tokens_before"] == 11 and r["tokens_after"] == 5
    assert r["vocab_before"] == r["vocab_after"] == 5
    assert r["token_removal_share"] == pytest.approx(6 / 11, abs=1e-6)


def test_engine_audit_composes_certified_reports(spark, sf_dir):
    """The one-call publish gate returns every certified report frame
    with its certified schema; clean testdata shows zero orphans/dups."""
    from hadoop_stuff_spark.engine import Engine

    rep = Engine(spark).audit(sf_dir)
    assert set(rep) == {
        "referential",
        "duplicate_keys",
        "orders_profile",
        "benford",
        "source_similarity",
        "length_drift",
    }
    ri = rep["referential"].collect()
    assert len(ri) == 7 and all(r["n_orphans"] == 0 for r in ri)
    assert all(r["n_null_fks"] == 0 for r in ri)  # clean testdata
    dk = rep["duplicate_keys"].collect()
    assert len(dk) == 7 and all(r["n_dup_keys"] == 0 for r in dk)
    assert rep["orders_profile"].count() == 6  # one row per orders column
    assert rep["benford"].count() == 9  # all nine digits materialized
    assert rep["source_similarity"].count() == 190  # C(20,2) source pairs
    assert rep["length_drift"].count() == 20  # one PSI row per source


def test_value_drift_psi_stable_vs_shifted(spark, tmp_path):
    """Identical early/late value distributions → PSI ≈ 0; a hard mean
    shift in the late half → PSI well past the 0.25 investigate line."""
    from hadoop_stuff_spark.operators.profile import value_drift_psi

    stable, shifted = [], []
    for i in range(200):
        half = 0.0 if i < 100 else 100000.0  # seconds: early / late halves
        v = float(i % 10)
        stable.append((1, "stable", half + i * 0.001, v))
        shifted.append((1, "shifted", half + i * 0.001, v + (50.0 if i >= 100 else 0.0)))
    # events fixture shape: (user_id, event_type, t_seconds) + custom value
    rows = [(u, t, s) for u, t, s, _ in stable + shifted]
    sf = _events_typed_fixture(tmp_path, rows, "sf_psi")
    import pyarrow.parquet as pq2

    t = pq2.read_table(f"{sf}/events.parquet")
    vals = [v for _, _, _, v in stable + shifted]
    t = t.set_column(
        t.schema.get_field_index("value"), "value", pa.array(vals, pa.float64())
    )
    pq2.write_table(t, f"{sf}/events.parquet")

    out = {r["event_type"]: r for r in value_drift_psi(spark, sf).collect()}
    assert out["stable"]["psi"] < 0.01
    assert out["shifted"]["psi"] > 0.25
    assert out["shifted"]["n_early"] == 100 and out["shifted"]["n_late"] == 100


def test_decile_lift_approx_path_tracks_exact(spark, sf_dir):
    """The sketch-boundary decile path (no global sort — the 100 TB
    shape) must track the exact ntile table: same 10 deciles, full
    probability mass, cumulative shares within the boundary-tie wobble."""
    from hadoop_stuff_spark.operators.profile import order_value_decile_lift

    exact = {r["decile"]: r for r in order_value_decile_lift(spark, sf_dir).collect()}
    approx = {
        r["decile"]: r
        for r in order_value_decile_lift(spark, sf_dir, exact=False).collect()
    }
    assert set(approx) == set(range(1, 11))
    assert sum(r["revenue_share"] for r in approx.values()) == pytest.approx(
        1.0, abs=1e-4
    )
    assert sum(r["n_customers"] for r in approx.values()) == sum(
        r["n_customers"] for r in exact.values()
    )  # every customer lands in exactly one decile
    for d in range(1, 11):
        assert approx[d]["cum_share"] == pytest.approx(
            exact[d]["cum_share"], abs=0.02
        )
    # the plan really avoids the global sort: no ntile Window in approx
    plan = (
        order_value_decile_lift(spark, sf_dir, exact=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # ('ntile' alone would also match approx_PERCENTILE's name)
    assert "ntile(10)" not in plan, plan


def test_hourly_profile_shares_and_hours(spark, sf_dir):
    """Structural invariants: hours in [0, 24), per-type shares sum to 1."""
    from collections import defaultdict

    from hadoop_stuff_spark.operators.temporal import events_hourly_profile

    rows = events_hourly_profile(spark, sf_dir).collect()
    assert all(0 <= r["hour_of_day"] < 24 for r in rows)
    by_type = defaultdict(float)
    for r in rows:
        by_type[r["event_type"]] += r["type_share"]
    assert all(abs(v - 1.0) < 1e-4 for v in by_type.values())


def test_charclass_profile_hand_computed(spark, tmp_path):
    """'Ab1 c!' → 6 chars: 1 upper, 1 digit, 1 space, 1 symbol — each
    share exactly 1/6; an empty-text source yields NULL shares, not an
    ANSI crash."""
    from hadoop_stuff_spark.operators.textstats import n3_charclass_profile

    rows = [("s", "Ab1 c!"), ("empty", "")]
    sf = _docs_fixture(tmp_path, rows, "sf_cc")
    out = {r["source"]: r for r in n3_charclass_profile(spark, sf).collect()}
    s = out["s"]
    assert s["n_chars"] == 6
    for col in ["upper_share", "digit_share", "space_share", "symbol_share"]:
        assert s[col] == pytest.approx(1 / 6, abs=1e-6)
    e = out["empty"]
    assert e["n_chars"] == 0
    assert e["upper_share"] is None
