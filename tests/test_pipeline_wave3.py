"""Property tests for the third round-6-continuation wave: quality-argmax
cluster canonicalization, per-dimension embedding stats, day-of-week
seasonal outliers, Efraimidis-Spirakis weighted sampling. Oracle parity
rides the registry-wide sweep; these pin semantics on constructed inputs
with hand-computed answers."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.clusters import canonicalize_clusters
from hadoop_stuff_spark.operators.sampling import weighted_sample_topk
from hadoop_stuff_spark.operators.similarity import embedding_dim_stats
from hadoop_stuff_spark.operators.temporal import dow_seasonal_outliers


def test_canonicalize_picks_score_argmax_with_id_tiebreak(spark):
    """Cluster 1 keeps its best-scoring member; cluster 10 has a score
    tie broken by the LOWER doc_id; n_dropped = size - 1."""
    members = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (11, 10, 2), (10, 10, 2)],
        ["doc_id", "cluster_id", "cluster_size"],
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.7), (11, 0.7)],
        ["doc_id", "model_score"],
    )
    out = {
        r["cluster_id"]: r
        for r in canonicalize_clusters(members, scores).collect()
    }
    assert out[1]["canonical_doc"] == 2
    assert out[1]["canonical_score"] == pytest.approx(0.9)
    assert out[1]["n_dropped"] == 2
    assert out[10]["canonical_doc"] == 10  # tie -> lower id
    assert out[10]["n_dropped"] == 1


def test_embedding_dim_stats_hand_computed(spark):
    """Three 2-d vectors: dim 1 = [1, 2, 3] -> mean 2, var 1, min 1,
    max 3; dim 2 = [0, 0, 6] -> mean 2, var 12."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [2.0, 0.0], 0), (2, [3.0, 6.0], 0)],
        ["vec_id", "embedding", "label"],
    )
    rows = {r["dim"]: r for r in embedding_dim_stats(emb).collect()}
    assert rows[1]["n"] == 3 and rows[2]["n"] == 3
    assert rows[1]["mean_x"] == pytest.approx(2.0)
    assert rows[1]["var_x"] == pytest.approx(1.0)
    assert rows[1]["min_x"] == 1.0 and rows[1]["max_x"] == 3.0
    assert rows[2]["mean_x"] == pytest.approx(2.0)
    assert rows[2]["var_x"] == pytest.approx(12.0)


def _events_fixture(spark, tmp_path, day_values):
    """Write an events.parquet whose ts column is parquet TIMESTAMP(NANOS)
    — the testdata layout load_table detects in the footer and rebuilds —
    one event per (date, value) at 12:00 UTC."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    ns, vals = [], []
    for day, value in day_values:
        t = dt.datetime.strptime(day, "%Y-%m-%d").replace(
            hour=12, tzinfo=dt.timezone.utc
        )
        ns.append(int(t.timestamp()) * 1_000_000_000)
        vals.append(value)
    n = len(ns)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ns, pa.timestamp("ns")),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["t"] * n),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / "sf"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_dow_seasonal_outliers_flags_the_off_baseline_days(spark, tmp_path):
    """Mondays [10,10,40] and Tuesdays [5,5,9]: the third day of each
    weekday is the anomaly (z = +1.154701 by the {a,a,b} identity); the
    single Wednesday has no std and must be excluded, not divide by
    zero."""
    sf = _events_fixture(
        spark,
        tmp_path,
        [
            ("2026-01-05", 10.0),
            ("2026-01-12", 10.0),
            ("2026-01-19", 40.0),
            ("2026-01-06", 5.0),
            ("2026-01-13", 5.0),
            ("2026-01-20", 9.0),
            ("2026-01-07", 99.0),  # lone Wednesday
        ],
    )
    rows = dow_seasonal_outliers(spark, sf).collect()
    days = [str(r["day"]) for r in rows]
    assert "2026-01-07" not in days
    assert len(rows) == 6
    # top-|z| rows first, day tiebreak among equal |z|
    assert days[:2] == ["2026-01-19", "2026-01-20"]
    top = rows[0]
    assert top["dow_mean"] == pytest.approx(20.0)
    assert top["z"] == pytest.approx(1.154701)
    assert rows[1]["z"] == pytest.approx(1.154701)
    assert all(abs(r["z"]) == pytest.approx(0.57735) for r in rows[2:])


def _es_key(doc_id, weight, salt="es1"):
    # ln(u) rounded BEFORE the division (full key resolution at any
    # weight scale; see weighted_sample_topk docstring)
    v = int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:6], 16)
    u = (v + 1.0) / 16**6
    return round(math.log(u), 8) / weight


def test_weighted_sample_equal_weights_matches_reference_order(spark):
    """With all weights equal, A-ES degrades to plain hash-order top-k;
    the selected set and es_key values match a python recomputation."""
    df = spark.createDataFrame(
        [(i, 1) for i in range(10)], ["doc_id", "w"]
    )
    got = [
        (r["doc_id"], r["es_key"])
        for r in weighted_sample_topk(df, "doc_id", "w", 3).collect()
    ]
    expect = sorted(
        ((i, _es_key(i, 1)) for i in range(10)),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert got == expect


def test_weighted_sample_heavy_weight_dominates_and_bad_weights_drop(spark):
    """A weight 10^9 row is picked at k=1 (its key is ~0); zero and
    negative weights are excluded entirely."""
    df = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 10**9), (3, 0), (4, -5)], ["doc_id", "w"]
    )
    (top,) = weighted_sample_topk(df, "doc_id", "w", 1).collect()
    assert top["doc_id"] == 2
    all_rows = weighted_sample_topk(df, "doc_id", "w", 10).collect()
    assert {r["doc_id"] for r in all_rows} == {0, 1, 2}


def test_weighted_sample_keys_keep_resolution_at_large_weights(spark):
    """Code-review regression: rounding the QUOTIENT to 8 dp collapsed
    1000 weight-1e8 rows to ~10 distinct keys (the id tiebreak, not the
    weights, then picked the sample). Rounding ln(u) before the division
    keeps full resolution: keys must be (near-)unique and the pick must
    match the python A-ES reference, not the low-id prefix."""
    df = spark.createDataFrame(
        [(i, 10**8) for i in range(1000)], ["doc_id", "w"]
    )
    rows = weighted_sample_topk(df, "doc_id", "w", 1000).collect()
    keys = [r["es_key"] for r in rows]
    assert len(set(keys)) >= 990
    top10 = [r["doc_id"] for r in rows[:10]]
    expect = sorted(
        ((i, _es_key(i, 10**8)) for i in range(1000)),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert top10 == [i for i, _ in expect]
    assert top10 != list(range(10))


def test_dow_outliers_zero_variance_weekday_excluded_not_crash(spark, tmp_path):
    """Code-review regression: a weekday whose totals are identical
    every week has dow_std = 0 — under ANSI mode the z division raised
    DIVIDE_BY_ZERO. Such weekdays are now excluded like the <2-day
    ones."""
    sf = _events_fixture(
        spark,
        tmp_path,
        [
            ("2026-01-05", 10.0),  # two identical Mondays: std 0
            ("2026-01-12", 10.0),
            ("2026-01-06", 5.0),   # two normal Tuesdays
            ("2026-01-13", 7.0),
        ],
    )
    rows = dow_seasonal_outliers(spark, sf).collect()
    days = [str(r["day"]) for r in rows]
    assert "2026-01-05" not in days and "2026-01-12" not in days
    assert sorted(days) == ["2026-01-06", "2026-01-13"]


def test_canonicalize_unscored_members_rank_last_not_drop(spark):
    """Code-review regression: the score join was INNER, so members
    missing a score silently vanished — a cluster could pick a worse
    copy or disappear entirely. Unscored members now rank after scored
    ones; an all-unscored cluster emits its lowest id with NULL score."""
    members = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 2), (10, 10, 2), (11, 10, 2)],
        ["doc_id", "cluster_id", "cluster_size"],
    )
    # doc 2 unscored; cluster 10 entirely unscored
    scores = spark.createDataFrame([(1, 0.3)], ["doc_id", "model_score"])
    out = {
        r["cluster_id"]: r
        for r in canonicalize_clusters(members, scores).collect()
    }
    assert out[1]["canonical_doc"] == 1  # scored beats unscored
    assert out[1]["n_dropped"] == 1
    assert out[10]["canonical_doc"] == 10  # lowest id of the unscored
    assert out[10]["canonical_score"] is None


def test_dow_outliers_negative_fp_variance_is_not_nan(spark, tmp_path):
    """Second-review regression: identical totals like 0.1 make
    ss - s*s/n round slightly NEGATIVE, sqrt gave NaN, and NaN > 0 is
    TRUE in Spark — NaN z rows ranked FIRST. The variance is now clamped
    at 0 before sqrt, so such weekdays are excluded like exact-zero
    ones."""
    sf = _events_fixture(
        spark,
        tmp_path,
        [
            ("2026-01-05", 0.1),  # three Mondays, all 0.1: fp variance < 0
            ("2026-01-12", 0.1),
            ("2026-01-19", 0.1),
            ("2026-01-06", 5.0),  # two normal Tuesdays
            ("2026-01-13", 7.0),
        ],
    )
    rows = dow_seasonal_outliers(spark, sf).collect()
    days = [str(r["day"]) for r in rows]
    assert all(d.endswith(("-06", "-13")) for d in days)
    assert all(not math.isnan(r["z"]) for r in rows)
