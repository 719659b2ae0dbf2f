"""Round-10 operator wave: planted-signal fixtures for the Poisson
bootstrap A/B CI, the seasonal-residual changepoint, and the per-source
near-dup rate (VERDICT r9 #7 operator ideas)."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest  # noqa: F401

_DAY_US = 86_400 * 1_000_000
_EPOCH_US = 1_000_000_000 * 1_000_000  # 2001-09-09, any midnight works


def _orders_fixture(tmp_path, daily_counts, name="sf_cp"):
    """orders.parquet with exactly daily_counts[t] rows on day t."""
    dates, keys = [], []
    k = 0
    for t, n in enumerate(daily_counts):
        for _ in range(n):
            dates.append(_EPOCH_US + t * _DAY_US)
            keys.append(k)
            k += 1
    table = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array([1] * k, pa.int64()),
            "o_orderstatus": pa.array(["F"] * k),
            "o_totalprice": pa.array([10.0] * k, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * k),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "orders.parquet"))
    return str(sf)


def test_seasonal_residual_changepoint_localizes_growth_onset(spark, tmp_path):
    """A pure weekly pattern has residual 0; from week 6 every week adds
    +3 over the previous week (sustained growth), so the residual series
    is 0,...,0,3,3,... — the split must land on the LAST flat day, with
    exact segment means 0 and 3."""
    from hadoop_stuff_spark.operators.temporal import seasonal_residual_changepoint

    pattern = [3, 1, 1, 1, 1, 1, 2]
    counts = []
    for t in range(70):
        week = t // 7
        growth = 3 * max(0, week - 5)  # weeks 6.. grow by +3/week
        counts.append(5 + pattern[t % 7] + growth)
    sf = _orders_fixture(tmp_path, counts)
    row = seasonal_residual_changepoint(spark, sf).collect()[0]
    # residuals exist for t=7..69 (63 points); t=7..41 are 0, t=42.. are 3
    assert row["n_left"] == 35 and row["n_right"] == 28
    assert row["mean_resid_left"] == 0.0
    assert row["mean_resid_right"] == 3.0
    # split_date is day index 41 (the last zero-residual day)
    assert int(row["split_date"].timestamp() * 1_000_000) == _EPOCH_US + 41 * _DAY_US
    assert row["shift_tstat"] > 5.0


def _in_arm_a(uid: int) -> bool:
    """The engine's md5 arm assignment (salt ab1:, fraction 0.5)."""
    return hashlib.md5(f"ab1:{uid}".encode()).hexdigest()[:6] < "800000"


def _events_fixture(tmp_path, rows, name="sf_ab"):
    n = len(rows)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([_EPOCH_US] * n, pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_ab_bootstrap_ci_constant_arms_collapse_to_exact_diff(spark, tmp_path):
    """Values constant within each arm ⇒ every bootstrap replicate's
    mean difference is EXACTLY the same number, so the CI collapses to
    [diff, diff], flags significant, and all replicates survive."""
    from hadoop_stuff_spark.operators.profile import _BOOT_B, ab_value_bootstrap_ci

    rows = []
    for uid in range(200):
        rows.append((uid, "buy", 100.0 if _in_arm_a(uid) else 1.0))
    sf = _events_fixture(tmp_path, rows)
    out = ab_value_bootstrap_ci(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] + r["n_b"] == 200 and min(r["n_a"], r["n_b"]) >= 2
    assert r["mean_diff"] == 99.0
    assert r["ci_lo"] == 99.0 and r["ci_hi"] == 99.0
    assert r["significant"] is True
    assert r["n_reps"] == _BOOT_B  # no replicate lost an arm at n=100/arm


def test_ab_bootstrap_ci_null_arm_excluded_and_deterministic(spark, tmp_path):
    """An event type whose B-arm values are all NULL has n_b=0 and must
    be excluded (the z-test's degenerate rule); reruns are identical."""
    from hadoop_stuff_spark.operators.profile import ab_value_bootstrap_ci

    rows = []
    for uid in range(120):
        a = _in_arm_a(uid)
        rows.append((uid, "ok_type", 5.0 if a else 2.0))
        rows.append((uid, "broken_type", 1.0 if a else None))
    sf = _events_fixture(tmp_path, rows)
    out1 = ab_value_bootstrap_ci(spark, sf).collect()
    assert [r["event_type"] for r in out1] == ["ok_type"]
    out2 = ab_value_bootstrap_ci(spark, sf).collect()
    assert out1 == out2


def _docs_fixture(tmp_path, docs, name="sf_nd"):
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


def test_per_source_near_dup_rate_grid_and_rates(spark, tmp_path):
    """Source A: two docs sharing almost all shingles (near-dups) plus a
    distinct one → rate 2/3. Source B: all-distinct docs → an explicit
    0-rate row (zero-cell rule), never a missing row."""
    from hadoop_stuff_spark.operators.dedup import per_source_near_dup_rate

    near_a = "the quick brown fox jumps over the lazy dog again and again"
    near_b = "the quick brown fox jumps over the lazy dog again and once"
    docs = [
        (1, "srcA", near_a),
        (2, "srcA", near_b),
        (3, "srcA", "completely unrelated text about parquet row groups"),
        (4, "srcB", "structured streaming watermarks drop late arrivals"),
        (5, "srcB", "broadcast joins avoid shuffling the large fact side"),
    ]
    sf = _docs_fixture(tmp_path, docs)
    rows = {r["source"]: r for r in per_source_near_dup_rate(spark, sf).collect()}
    assert set(rows) == {"srcA", "srcB"}
    assert rows["srcA"]["n_docs"] == 3 and rows["srcA"]["n_near_dup"] == 2
    assert rows["srcA"]["near_dup_rate"] == round(2 / 3, 6)
    assert rows["srcB"]["n_near_dup"] == 0 and rows["srcB"]["near_dup_rate"] == 0.0
