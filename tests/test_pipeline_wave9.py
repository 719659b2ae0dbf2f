"""Round-9 second-wave tests: changepoint localization, forecast
backtest, and the daily-orders ACF — all on planted order series with
hand-computable answers."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest  # noqa: F401


def _orders_fixture(tmp_path, day_counts, name="sf_ord", priority="1-URGENT"):
    """orders.parquet with ``day_counts[i]`` orders on base-date + i days.
    A None count skips the day entirely (a calendar gap, not a 0-count
    row) so densification behavior is observable."""
    base_ns = 1_700_000_000 * 1_000_000_000
    day_ns = 86_400 * 1_000_000_000
    keys, dates = [], []
    k = 0
    for i, c in enumerate(day_counts):
        if c is None:
            continue
        for _ in range(c):
            keys.append(k)
            dates.append(base_ns + i * day_ns)
            k += 1
    table = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array([1] * k, pa.int64()),
            "o_orderstatus": pa.array(["O"] * k),
            "o_totalprice": pa.array([100.0] * k, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("ns")),
            "o_orderpriority": pa.array([priority] * k),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "orders.parquet"))
    return str(sf)


def test_changepoint_localizes_planted_level_shift(spark, tmp_path):
    """30 days at 2/day then 30 days at 8/day: the best binary-segmentation
    split is exactly the regime boundary, with the two regime means
    recovered exactly (integer prefix-sum arithmetic, no estimation)."""
    from hadoop_stuff_spark.operators.temporal import changepoint_daily_orders

    sf = _orders_fixture(tmp_path, [2] * 30 + [8] * 30, "sf_cp")
    rows = changepoint_daily_orders(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_left"] == 30 and r["n_right"] == 30
    assert r["mean_left"] == 2.0 and r["mean_right"] == 8.0
    assert r["shift_tstat"] > 0


def test_changepoint_split_day_is_regime_boundary(spark, tmp_path):
    from hadoop_stuff_spark.operators.temporal import changepoint_daily_orders

    sf = _orders_fixture(tmp_path, [5] * 10 + [1] * 10, "sf_cp2")
    r = changepoint_daily_orders(spark, sf).collect()[0]
    # left regime = first 10 days; the split date is its last day,
    # i.e. 9 days after the first observed date
    from hadoop_stuff_spark.catalog import load_table

    first = min(
        x["o_orderdate"]
        for x in load_table(spark, sf, "orders").select("o_orderdate").collect()
    )
    assert (r["split_date"] - first).days == 9
    assert r["mean_left"] == 5.0 and r["mean_right"] == 1.0


def test_forecast_backtest_seasonal_naive_wins_on_weekly_series(spark, tmp_path):
    """A perfectly weekly-periodic series: seasonal-naive has zero error on
    every evaluated day; plain naive does not (the series moves day to
    day). The calendar gap day counts as 0 — densification keeps lag-7
    aligned to the weekday, so seasonal-naive stays exact only because
    the gap repeats weekly in this fixture."""
    from hadoop_stuff_spark.operators.temporal import (
        forecast_backtest_daily_orders,
    )

    week = [4, 9, 2, 7, 5, 3, 6]
    sf = _orders_fixture(tmp_path, week * 4, "sf_fb")
    out = {r["method"]: r for r in forecast_backtest_daily_orders(spark, sf).collect()}
    assert set(out) == {"naive", "seasonal_naive", "ma7"}
    assert out["seasonal_naive"]["mae"] == 0.0
    assert out["seasonal_naive"]["rmse"] == 0.0
    assert out["seasonal_naive"]["bias"] == 0.0
    assert out["naive"]["mae"] > 0
    # 28 days, first 7 burn in
    assert out["naive"]["n_days"] == 21


def test_forecast_backtest_densifies_calendar_gaps(spark, tmp_path):
    """A missing day is a 0-count day, not a skipped row: naive error on
    the day AFTER the gap is the full count (prediction 0), which only
    happens if the gap day materialized."""
    from hadoop_stuff_spark.operators.temporal import (
        forecast_backtest_daily_orders,
    )

    counts = [3] * 14 + [None] + [3] * 7
    sf = _orders_fixture(tmp_path, counts, "sf_fb_gap")
    out = {r["method"]: r for r in forecast_backtest_daily_orders(spark, sf).collect()}
    # 22 calendar days, 7 burned in → 15 evaluated (incl. the gap day)
    assert out["naive"]["n_days"] == 15
    # two nonzero naive errors: onto the gap (|0-3|) and off it (|3-0|)
    assert out["naive"]["mae"] == round(6 / 15, 6)


def test_acf_weekly_series_peaks_at_lag_7(spark, tmp_path):
    from hadoop_stuff_spark.operators.temporal import acf_daily_orders

    week = [4, 9, 2, 7, 5, 3, 6]
    sf = _orders_fixture(tmp_path, week * 5, "sf_acf")
    rows = {r["lag"]: r for r in acf_daily_orders(spark, sf).collect()}
    assert set(rows) == set(range(1, 15))
    assert rows[7]["acf"] == 1.0
    assert rows[14]["acf"] == 1.0
    assert rows[1]["acf"] < 1.0
    # lag-7 pairs: 35 days → 28 aligned pairs
    assert rows[7]["n_pairs"] == 28


def test_acf_constant_series_is_null_guarded(spark, tmp_path):
    """Zero-variance series: every acf is NULL (guarded), never NaN —
    the engine-wide ANSI NaN-guard convention."""
    from hadoop_stuff_spark.operators.temporal import acf_daily_orders

    sf = _orders_fixture(tmp_path, [5] * 21, "sf_acf_const")
    rows = acf_daily_orders(spark, sf).collect()
    assert len(rows) == 14
    assert all(r["acf"] is None for r in rows)


def test_acf_max_lag_parameter(spark, tmp_path):
    from hadoop_stuff_spark.operators.temporal import acf_daily_orders

    sf = _orders_fixture(tmp_path, [1, 2, 3] * 5, "sf_acf_k")
    assert acf_daily_orders(spark, sf, max_lag=3).count() == 3


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


def test_token_budget_clips_tiny_source_and_returns_budget(spark, tmp_path):
    """A tiny source whose temperature share over-allocates past the epoch
    cap is clipped: epochs == max_epochs exactly, tokens_drawn ==
    floor(max_epochs * n_tokens), and the unclipped source keeps its full
    allocation (floor-exact budget accounting)."""
    from hadoop_stuff_spark.operators.sampling import n3_token_budget_epochs

    rows = [(1, "big", "w " * 999 + "w"), (2, "tiny", "a b c d e f g h i j")]
    sf = _docs_fixture(tmp_path, rows, "sf_budget")
    out = {
        r["source"]: r
        for r in n3_token_budget_epochs(
            spark, sf, budget_tokens=2000, tau=4.0, max_epochs=4.0
        ).collect()
    }
    assert out["big"]["n_tokens"] == 1000 and out["tiny"]["n_tokens"] == 10
    assert out["tiny"]["clipped"] is True
    assert out["tiny"]["epochs"] == 4.0
    assert out["tiny"]["tokens_drawn"] == 40
    assert out["big"]["clipped"] is False
    assert out["big"]["tokens_drawn"] == out["big"]["allocated_tokens"]
    # floors only ever round down: total allocation never exceeds budget
    assert (
        out["big"]["allocated_tokens"] + out["tiny"]["allocated_tokens"] <= 2000
    )
    # realized shares sum to 1 over the drawn tokens
    total = out["big"]["tokens_drawn"] + out["tiny"]["tokens_drawn"]
    assert out["big"]["realized_share"] == round(
        out["big"]["tokens_drawn"] / total, 6
    )


def test_curation_funnel_gates_apply_in_sequence(spark, tmp_path):
    """Planted attrition: a cross-source duplicate loses to the earlier
    doc_id, a short doc dies at the length gate, a digits-only doc dies
    at the alpha gate — and each count lands in the right funnel stage."""
    from hadoop_stuff_spark.operators.cleaning import n3_curation_funnel_by_source

    good = ("good words here " * 10).strip()  # alpha-heavy, > 100 chars
    rows = [
        (1, "a", good),
        (2, "a", "tiny text"),  # fails length
        (3, "a", ("1234567890 " * 20).strip()),  # fails alpha ratio
        (4, "b", good),  # exact dup of doc 1 → loses dedup to source a
        (5, "b", good + " extra tail of words"),  # unique, survives
    ]
    sf = _docs_fixture(tmp_path, rows, "sf_funnel")
    out = {
        r["source"]: r for r in n3_curation_funnel_by_source(spark, sf).collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_after_dedup"]) == (3, 3)
    assert a["n_after_length"] == 2  # doc 2 died
    assert a["n_final"] == 1  # doc 3 died at alpha
    assert a["survival_pct"] == round(1 / 3, 6)
    assert (b["n_docs"], b["n_after_dedup"]) == (2, 1)  # doc 4 deduped away
    assert b["n_final"] == 1
    assert b["tokens_final"] == len((good + " extra tail of words").split(" "))


def test_dedup_weighted_sample_keeps_uniques_and_thins_dups(spark, tmp_path):
    """group_size 1 rows ALWAYS survive (u·1 < 16⁶ for every digest); a
    100-copy group survives with expectation 1 (binomial — assert a loose
    upper bound), and the draw is deterministic across runs."""
    from hadoop_stuff_spark.operators.dedup import dedup_weighted_sample

    uniques = [(i, "u", f"unique document number {i} with words") for i in range(5)]
    dups = [(100 + i, "d", "the copied document body") for i in range(100)]
    sf = _docs_fixture(tmp_path, uniques + dups, "sf_dws")
    from hadoop_stuff_spark.catalog import load_table

    docs = load_table(spark, sf, "documents")
    kept1 = sorted(r["doc_id"] for r in dedup_weighted_sample(docs).collect())
    kept2 = sorted(r["doc_id"] for r in dedup_weighted_sample(docs).collect())
    assert kept1 == kept2  # pure function of the rows
    assert [i for i in kept1 if i < 5] == [0, 1, 2, 3, 4]
    n_dup_kept = len([i for i in kept1 if i >= 100])
    assert n_dup_kept <= 8  # P(Binom(100, 0.01) > 8) ≈ 1e-8
    # independent draw under a different salt actually differs in the
    # dup group with overwhelming probability OR keeps uniques anyway
    kept3 = sorted(
        r["doc_id"] for r in dedup_weighted_sample(docs, salt="dws2").collect()
    )
    assert [i for i in kept3 if i < 5] == [0, 1, 2, 3, 4]


def _emb_fixture(tmp_path, rows, name):
    """(vec_id, embedding, label) embeddings table."""
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "embeddings.parquet"))
    return str(sf)


def test_anisotropy_identical_vectors_is_one_and_pr_null_guarded(spark, tmp_path):
    """All-identical vectors: the mean direction carries ALL the squared
    norm (anisotropy exactly 1), and zero variance everywhere makes the
    participation ratio NULL (guarded), never NaN."""
    from hadoop_stuff_spark.operators.similarity import n2_anisotropy_report

    rows = [(i, [1.0, 2.0, 2.0, 0.0], 0) for i in range(10)]
    sf = _emb_fixture(tmp_path, rows, "sf_iso")
    r = n2_anisotropy_report(spark, sf).collect()[0]
    assert r["n_vecs"] == 10 and r["n_dims"] == 4
    assert r["anisotropy"] == 1.0
    assert r["participation_ratio"] is None
    assert r["n_dead_dims"] == 4
    assert r["centroid_norm"] == 3.0  # sqrt(1+4+4)


def test_anisotropy_equal_variance_dims_pr_equals_n_dims(spark, tmp_path):
    """One-hot basis vectors, each dimension equally often: every dim has
    the same variance, so PR = (d·v)²/(d·v²) = d exactly."""
    from hadoop_stuff_spark.operators.similarity import n2_anisotropy_report

    rows = []
    for rep in range(3):
        for d in range(4):
            v = [0.0] * 4
            v[d] = 1.0
            rows.append((rep * 4 + d, v, 0))
    sf = _emb_fixture(tmp_path, rows, "sf_onehot")
    r = n2_anisotropy_report(spark, sf).collect()[0]
    assert r["participation_ratio"] == 4.0
    assert r["n_dead_dims"] == 0
    # mean vector = (1/4,..): ||mu||^2 = 4/16 = 0.25; E||x||^2 = 1
    assert r["anisotropy"] == 0.25


def test_label_silhouette_separated_vs_coincident(spark, tmp_path):
    """Two tight, well-separated labels score ~1; a third label placed
    exactly ON label 0's centroid scores ≤ 0 (its nearest-other is as
    close as its own centroid)."""
    from hadoop_stuff_spark.operators.similarity import n2_label_silhouette

    rows = (
        [(i, [0.0, float(i % 2) * 0.2, 0.0, 0.0], 0) for i in range(4)]
        + [(10 + i, [10.0, float(i % 2) * 0.2, 0.0, 0.0], 1) for i in range(4)]
        + [(20 + i, [0.0, float(i % 2) * 0.2, 0.0, 0.0], 2) for i in range(4)]
    )
    sf = _emb_fixture(tmp_path, rows, "sf_sil")
    out = {r["label"]: r for r in n2_label_silhouette(spark, sf).collect()}
    assert out[1]["avg_silhouette"] > 0.9
    # labels 0 and 2 coincide: own-centroid distance == other-centroid
    # distance, silhouette ~0 (and never positive)
    assert out[0]["avg_silhouette"] <= 0.0
    assert out[2]["avg_silhouette"] <= 0.0
    assert out[1]["n_vecs"] == 4


def test_label_silhouette_identical_point_all_labels_zero_guard(spark, tmp_path):
    """Every vector of every label at the same point: a = b = 0 → the
    max(a,b) guard yields silhouette 0, not a division error."""
    from hadoop_stuff_spark.operators.similarity import n2_label_silhouette

    rows = [(i, [1.0, 1.0], i % 2) for i in range(6)]
    sf = _emb_fixture(tmp_path, rows, "sf_sil0")
    out = n2_label_silhouette(spark, sf).collect()
    assert all(r["avg_silhouette"] == 0.0 for r in out)
    assert all(r["avg_dist_own"] == 0.0 for r in out)


def test_length_psi_identical_sources_is_zero_shifted_source_flags(
    spark, tmp_path
):
    """Sources with the corpus's own length mix score PSI ~0; a source
    whose lengths sit in bins the corpus barely uses scores past the
    0.25 'investigate' threshold and ranks first."""
    from hadoop_stuff_spark.operators.profile import n3_length_psi_by_source

    rows = []
    did = iter(range(10_000))
    # a and b: same mix of short and long docs
    for src in ("a", "b"):
        for _ in range(10):
            rows.append((next(did), src, "x" * 10))
            rows.append((next(did), src, "y" * 200))
    sf_same = _docs_fixture(tmp_path, rows, "sf_psi_same")
    out = {
        r["source"]: r["psi"]
        for r in n3_length_psi_by_source(spark, sf_same).collect()
    }
    assert all(v < 0.01 for v in out.values())

    rows_shift = rows + [(next(did), "c", "z" * 400) for _ in range(20)]
    sf_shift = _docs_fixture(tmp_path, rows_shift, "sf_psi_shift")
    out2 = {
        r["source"]: r["psi"]
        for r in n3_length_psi_by_source(spark, sf_shift).collect()
    }
    assert out2["c"] > 0.25
    assert out2["c"] == max(out2.values())
    # zero-cell grid regression (r9 review): c holds 1/3 of the corpus in
    # a bin a and b are ABSENT from — their floored missing-bin terms must
    # appear (PSI >> 1), and c's fully-shifted profile scores ~9.2; the
    # pre-fix cell-only computation read 0.135/0.73 here
    assert out2["a"] > 2.0 and out2["b"] > 2.0
    assert out2["c"] > 9.0


def _valued_events_fixture(tmp_path, rows, name):
    """(user_id, event_type, second-offset, value) events table."""
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
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_weekly_quantile_trend_interpolated_medians_and_delta(spark, tmp_path):
    """Two full weeks of values 1..100 then 101..200: interpolated p50s
    are 50.5 and 150.5, the second week's delta is exactly 100, and the
    first week's delta is NULL."""
    from hadoop_stuff_spark.operators.temporal import weekly_value_quantile_trend

    week_s = 7 * 86_400
    # each cluster spans 100 minutes, far inside one ISO week, and the
    # second sits exactly one week later — two week buckets, one type
    rows = [(1, "m", i * 60.0, float(i + 1)) for i in range(100)]
    rows += [(1, "m", week_s + i * 60.0, float(101 + i)) for i in range(100)]
    sf = _valued_events_fixture(tmp_path, rows, "sf_qtrend")
    got = weekly_value_quantile_trend(spark, sf).collect()
    assert len(got) == 2
    first, second = got
    assert first["p50"] == 50.5 and first["p50_delta"] is None
    assert second["p50"] == 150.5 and second["p50_delta"] == 100.0
    assert first["p99"] == round(1 + 99 * 0.99, 4)
    assert first["n_events"] == 100


def _basket_fixture(tmp_path, order_cust, order_parts, name):
    """orders.parquet + lineitem.parquet: order_cust maps order→customer,
    order_parts maps order→list of parts."""
    okeys = sorted(order_cust)
    base_ns = 1_700_000_000 * 1_000_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys, pa.int64()),
            "o_custkey": pa.array([order_cust[k] for k in okeys], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(okeys)),
            "o_totalprice": pa.array([100.0] * len(okeys), pa.float64()),
            "o_orderdate": pa.array([base_ns] * len(okeys), pa.timestamp("ns")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(okeys)),
        }
    )
    lk, lp = [], []
    for k in okeys:
        for p in order_parts[k]:
            lk.append(k)
            lp.append(p)
    n = len(lk)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(lk, pa.int64()),
            "l_partkey": pa.array(lp, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([10.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array([base_ns] * n, pa.timestamp("ns")),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(orders, str(sf / "orders.parquet"))
    pq.write_table(lineitem, str(sf / "lineitem.parquet"))
    return str(sf)


def test_part_neighbor_jaccard_exact_overlap_and_whale_cut(spark, tmp_path):
    """Parts 1 and 2 share exactly 3 of 4/5 customers → jaccard 3/6; a
    whale customer who buys EVERY part is cut by the df-guard, so it
    neither inflates intersections nor unions."""
    from hadoop_stuff_spark.operators.relational import part_neighbor_jaccard

    # customers 1..3 buy both part 1 and part 2 (one order each per part);
    # customer 4 buys only part 1; customers 5,6 buy only part 2;
    # customer 99 is the whale buying parts 1,2,3 (cut at max=2)
    order_cust, order_parts, ok = {}, {}, iter(range(1, 100))
    def add(cust, parts):
        k = next(ok)
        order_cust[k] = cust
        order_parts[k] = parts
    for c in (1, 2, 3):
        add(c, [1, 2])
    add(4, [1])
    add(5, [2])
    add(6, [2])
    add(99, [1, 2, 3])
    sf = _basket_fixture(tmp_path, order_cust, order_parts, "sf_pnj")
    rows = part_neighbor_jaccard(
        spark, sf, min_common=2, max_parts_per_customer=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["part_a"], r["part_b"]) == (1, 2)
    # whale cut: sizes are 4 and 5 (not 5 and 6), intersection 3
    assert (r["n_common"], r["n_a"], r["n_b"]) == (3, 4, 5)
    assert r["jaccard"] == 0.5


def test_revenue_concentration_uniform_zero_one_whale_high(spark, tmp_path):
    """Equal spends → Gini exactly 0 and top-10% share = its head count
    share; one whale holding all revenue → Gini = (n−1)/n exactly and
    top-1% share = 1."""
    from hadoop_stuff_spark.operators.relational import (
        customer_revenue_concentration,
    )

    uniform = _orders_fixture(tmp_path, [10] * 10, "sf_rc_u")
    # one order per customer: rewrite custkeys to distinct values
    import pyarrow.parquet as _pq

    t = _pq.read_table(os.path.join(uniform, "orders.parquet"))
    t = t.set_column(
        1, "o_custkey", pa.array(list(range(t.num_rows)), pa.int64())
    )
    _pq.write_table(t, os.path.join(uniform, "orders.parquet"))
    r = customer_revenue_concentration(spark, uniform).collect()[0]
    assert r["n_customers"] == 100
    assert r["gini"] == 0.0
    assert r["top10_share"] == 0.1

    whale = tmp_path / "sf_rc_w"
    os.makedirs(whale)
    rows = 100
    base_ns = 1_700_000_000 * 1_000_000_000
    t2 = pa.table(
        {
            "o_orderkey": pa.array(range(rows), pa.int64()),
            "o_custkey": pa.array(range(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * rows),
            "o_totalprice": pa.array(
                [1000000.0] + [0.0] * (rows - 1), pa.float64()
            ),
            "o_orderdate": pa.array([base_ns] * rows, pa.timestamp("ns")),
            "o_orderpriority": pa.array(["1-URGENT"] * rows),
        }
    )
    _pq.write_table(t2, os.path.join(str(whale), "orders.parquet"))
    whale = str(whale)
    r = customer_revenue_concentration(spark, whale).collect()[0]
    assert r["n_customers"] == 100
    assert r["gini"] == round((100 - 1) / 100, 6)
    assert r["top1_share"] == 1.0
