"""Property tests for the sixth round-6-continuation wave: k-anonymity
suppression enforcement and the event-gap (outage) report."""

import datetime as dt

import pytest

from hadoop_stuff_spark.operators.anonymize import suppress_below_k
from hadoop_stuff_spark.operators.gaps import event_gap_report
from hadoop_stuff_spark.operators.quality import k_anonymity_report
from tests.test_pipeline_wave3 import _events_fixture


def test_suppress_below_k_nulls_small_classes_only(spark):
    """Classes of size 1 and 2 are suppressed at k=3; the size-3 class
    passes through untouched; non-quasi columns are never modified."""
    df = spark.createDataFrame(
        [
            ("nyc", 30, "u1"),
            ("nyc", 31, "u2"),
            ("sf", 40, "u3"),
            ("sf", 40, "u4"),
            ("sf", 40, "u5"),
            ("la", 50, "u6"),
            ("la", 50, "u7"),
        ],
        ["city", "age", "uid"],
    )
    out = {r["uid"]: r for r in suppress_below_k(df, ["city", "age"], 3).collect()}
    assert len(out) == 7  # no rows dropped
    for uid in ["u1", "u2", "u6", "u7"]:
        assert out[uid]["city"] is None and out[uid]["age"] is None
        assert out[uid]["suppressed"] is True
    for uid in ["u3", "u4", "u5"]:
        assert out[uid]["city"] == "sf" and out[uid]["age"] == 40
        assert out[uid]["suppressed"] is False


def test_suppress_then_audit_is_k_anonymous(spark):
    """Composition contract: after enforcement, the audit shows no class
    of size < k except possibly the single all-NULL suppressed class
    (which here has 4 members >= k anyway)."""
    df = spark.createDataFrame(
        [
            ("nyc", 30, "a"),
            ("nyc", 31, "b"),
            ("la", 50, "c"),
            ("la", 51, "d"),
            ("sf", 40, "e"),
            ("sf", 40, "f"),
            ("sf", 40, "g"),
        ],
        ["city", "age", "uid"],
    )
    enforced = suppress_below_k(df, ["city", "age"], 3).drop("suppressed")
    audit = k_anonymity_report(enforced, ["city", "age"]).collect()
    assert all(r["k"] >= 3 for r in audit)


def test_event_gap_report_finds_planted_outage(spark, tmp_path):
    """One user with events at minute cadence and a planted 3-day hole:
    the top gap is the hole, with exact second arithmetic."""
    sf = _events_fixture(
        spark,
        tmp_path,
        [
            ("2026-01-05", 1.0),
            ("2026-01-06", 1.0),
            ("2026-01-09", 1.0),  # 3-day gap after the 6th
            ("2026-01-10", 1.0),
        ],
    )
    rows = event_gap_report(spark, sf).collect()
    assert len(rows) == 3  # 4 events -> 3 gaps
    top = rows[0]
    assert str(top["gap_start"]).startswith("2026-01-06")
    assert str(top["gap_end"]).startswith("2026-01-09")
    assert top["gap_seconds"] == pytest.approx(3 * 86400.0)
    assert rows[1]["gap_seconds"] == pytest.approx(86400.0)


def test_quantile_normalize_maps_group_ranks_onto_global_grid(spark):
    """Two sources with shifted distributions: each source's min maps to
    the global 0th percentile (the global minimum) and each source's max
    to the global max — after normalization the per-source distributions
    coincide even though the raw scores never did. Mid ranks interpolate
    between grid points."""
    from hadoop_stuff_spark.operators.quantnorm import quantile_normalize

    rows = [
        # source "lo": scores 0.1..0.3; source "hi": 0.6..0.8
        (0, "lo", 0.1), (1, "lo", 0.2), (2, "lo", 0.3),
        (3, "hi", 0.6), (4, "hi", 0.7), (5, "hi", 0.8),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "model_score"])
    out = {r["doc_id"]: r["norm_score"] for r in
           quantile_normalize(df, "model_score", "source").collect()}
    # rank 0 of each source -> global minimum (0.1); rank 1 -> global max
    assert out[0] == pytest.approx(0.1)
    assert out[3] == pytest.approx(0.1)
    assert out[2] == pytest.approx(0.8)
    assert out[5] == pytest.approx(0.8)
    # the mid elements of both sources land on the SAME normalized value
    assert out[1] == out[4]
    assert 0.1 < out[1] < 0.8


def test_concurrent_session_pairs_planted_overlap(spark, tmp_path):
    """Users 7 and 8 share a planted 30-minute overlap (within one
    session each); user 9's session is disjoint. The bucketed
    interval-overlap join must find exactly the (7,8) pair with exact
    integer overlap seconds, counted ONCE despite the sessions spanning
    several join cells."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def ns(hhmm):
        t = dt.datetime(2026, 1, 5, *hhmm, tzinfo=dt.timezone.utc)
        return int(t.timestamp()) * 1_000_000_000

    # user 7: 10:00-12:00 (events every 20 min -> one session)
    # user 8: 11:30-13:30 -> overlap 11:30-12:00 = 1800 s
    # user 9: 15:00-15:10 -> disjoint
    rows = []
    eid = 0
    for user, times in [
        (7, [(10, 0), (10, 20), (10, 40), (11, 0), (11, 20), (11, 40), (12, 0)]),
        (8, [(11, 30), (11, 50), (12, 10), (12, 30), (12, 50), (13, 10), (13, 30)]),
        (9, [(15, 0), (15, 10)]),
    ]:
        for hhmm in times:
            rows.append((eid, ns(hhmm), user))
            eid += 1
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["t"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    sf = tmp_path / "sfc"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))

    from hadoop_stuff_spark.operators.temporal import concurrent_session_pairs

    out = concurrent_session_pairs(spark, str(sf)).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["user_a"], r["user_b"]) == (7, 8)
    assert r["n_session_pairs"] == 1  # multi-cell matches collapsed
    assert r["total_overlap_s"] == 1800


def test_suppress_drops_sub_k_null_class(spark):
    """Review regression: suppressed rows merge into ONE all-NULL class;
    if that class is itself smaller than k the rows are DROPPED (record
    suppression) — a lone (NULL, NULL) row is exactly as re-identifiable
    as any unique pattern. Output must be k-anonymous unconditionally."""
    df = spark.createDataFrame(
        [("nyc", 30, "a"), ("sf", 40, "b"), ("sf", 40, "c"), ("sf", 40, "d")],
        ["city", "age", "uid"],
    )
    out = suppress_below_k(df, ["city", "age"], 3)
    assert {r["uid"] for r in out.collect()} == {"b", "c", "d"}  # 'a' dropped
    audit = k_anonymity_report(out.drop("suppressed"), ["city", "age"]).collect()
    assert all(r["k"] >= 3 for r in audit)


def test_suppress_and_quantnorm_reject_reserved_columns(spark):
    """Reserved internal names raise instead of silently shadowing user
    data (the score_quality convention)."""
    import pytest as _pytest

    from hadoop_stuff_spark.operators.quantnorm import quantile_normalize

    df = spark.createDataFrame([("x", 1, True)], ["city", "age", "suppressed"])
    with _pytest.raises(ValueError, match="reserved"):
        suppress_below_k(df, ["city"], 2)
    df2 = spark.createDataFrame([(0, "s", 0.5, 1.0)], ["doc_id", "source", "model_score", "norm_score"])
    with _pytest.raises(ValueError, match="reserved"):
        quantile_normalize(df2, "model_score", "source")


def test_ohlc_open_close_follow_event_order(spark, tmp_path):
    """Open is the FIRST value by (ts, event_id), close the LAST — a
    min/max aggregate cannot express this; planted values pin it, and
    high/low are the extremes regardless of position."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os
    base_ns = 1_700_000_000 * 1_000_000_000
    vals = [5.0, 9.0, 1.0, 7.0]  # open 5, high 9, low 1, close 7
    table = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([base_ns + i * 60_000_000_000 for i in range(4)], pa.timestamp("ns")),
        "user_id": pa.array([7] * 4, pa.int64()),
        "event_type": pa.array(["t"] * 4),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    sf2 = tmp_path / "sf_ohlc"
    os.makedirs(sf2)
    pq.write_table(table, str(sf2 / "events.parquet"))

    from hadoop_stuff_spark.operators.temporal import ohlc_event_values

    (row,) = ohlc_event_values(spark, str(sf2)).collect()
    assert (row["open"], row["high"], row["low"], row["close"]) == (5.0, 9.0, 1.0, 7.0)
    assert row["n_events"] == 4


def test_ab_ztest_detects_planted_lift(spark, tmp_path):
    """Events whose value depends on the md5 arm assignment: arm A gets
    10±eps, arm B gets 5±eps -> welch_t is large and positive, and the
    per-arm means are exact."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_700_000_000 * 1_000_000_000
    rows = []
    for uid in range(40):
        in_a = int(hashlib.md5(f"ab1:{uid}".encode()).hexdigest()[:6], 16) < 0x800000
        base = 10.0 if in_a else 5.0
        for j in range(3):
            rows.append((len(rows), base + (j - 1) * 0.1, uid))
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base_ns + i * 1_000_000_000 for i in range(len(rows))], pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["t"] * len(rows)),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    sf = tmp_path / "sf_ab"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))

    from hadoop_stuff_spark.operators.profile import ab_value_ztest

    (row,) = ab_value_ztest(spark, str(sf)).collect()
    assert row["mean_a"] == pytest.approx(10.0)
    assert row["mean_b"] == pytest.approx(5.0)
    assert row["welch_t"] > 50  # planted 5.0 lift vs 0.1-scale noise
    assert row["n_a"] + row["n_b"] == len(rows)


def test_ohlc_tiebreak_on_equal_timestamps(spark, tmp_path):
    """Review regression: the (ts, event_id) tie-break is the operator's
    reason to use row_number over min_by — exercise it: all four events
    share ONE timestamp, so open/close are decided by event_id alone."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_700_000_000 * 1_000_000_000
    vals = [3.0, 8.0, 2.0, 6.0]  # event_ids 0..3 -> open 3.0, close 6.0
    table = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([base_ns] * 4, pa.timestamp("ns")),
        "user_id": pa.array([7] * 4, pa.int64()),
        "event_type": pa.array(["t"] * 4),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    sf = tmp_path / "sf_tie"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))

    from hadoop_stuff_spark.operators.temporal import ohlc_event_values

    (row,) = ohlc_event_values(spark, str(sf)).collect()
    assert (row["open"], row["close"]) == (3.0, 6.0)
    assert (row["high"], row["low"]) == (8.0, 2.0)


def test_ab_ztest_null_values_excluded_from_counts(spark, tmp_path):
    """Review regression: a NULL value must not inflate an arm's n while
    being absent from its sum — the mean would silently shrink."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_700_000_000 * 1_000_000_000
    # find two A-arm and two B-arm users
    def arm(uid):
        return int(hashlib.md5(f"ab1:{uid}".encode()).hexdigest()[:6], 16) < 0x800000
    a_users = [u for u in range(100) if arm(u)][:2]
    b_users = [u for u in range(100) if not arm(u)][:2]
    rows, vals = [], []
    for u in a_users:
        rows += [(len(rows), u), (len(rows) + 1, u)]
        vals += [10.0, None]  # one real event + one NULL per A user
    for u in b_users:
        rows += [(len(rows), u), (len(rows) + 1, u)]
        vals += [5.0, 6.0]
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base_ns + i * 1_000_000_000 for i in range(len(rows))], pa.timestamp("ns")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["t"] * len(rows)),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    sf = tmp_path / "sf_null"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))

    from hadoop_stuff_spark.operators.profile import ab_value_ztest

    (row,) = ab_value_ztest(spark, str(sf)).collect()
    assert row["n_a"] == 2  # NULLs not counted
    assert row["mean_a"] == pytest.approx(10.0)  # not shrunk by NULLs
    assert row["n_b"] == 4


def test_user_activity_span_hand_computed(spark, tmp_path):
    """Two bursts a year apart: span 365 days but only 4 active days —
    the intensity column separates what span and count both hide."""
    sf = _events_fixture(
        spark,
        tmp_path,
        [
            ("2025-01-01", 1.0),
            ("2025-01-01", 1.0),
            ("2025-01-02", 1.0),
            ("2026-01-01", 1.0),
            ("2026-01-01", 1.0),
            ("2026-01-01", 1.0),
            ("2026-01-02", 1.0),
            ("2026-01-02", 1.0),
        ],
    )
    from hadoop_stuff_spark.operators.temporal import user_activity_span

    (r,) = user_activity_span(spark, sf).collect()
    assert r["span_days"] == 366  # 2025-01-01 -> 2026-01-02
    assert r["active_days"] == 4
    assert r["n_events"] == 8
    assert r["events_per_active_day"] == pytest.approx(2.0)
