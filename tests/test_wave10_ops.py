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


def test_effective_token_yield_flags_long_doc_copier(spark, tmp_path):
    """srcB copies srcA's LONG doc: doc_yield 1/2 but token_yield far
    lower — the pattern the operator exists to expose. srcA (all
    canonical) reports yield 1.0."""
    from hadoop_stuff_spark.operators.dedup import n3_effective_token_yield

    long_text = " ".join(["tok"] * 99) + " end"  # 100 tokens
    docs = [
        (1, "srcA", long_text),
        (2, "srcB", long_text),  # copy of the canonical (doc_id 1 wins)
        (3, "srcB", "short unique two"),  # 3 tokens, canonical
    ]
    sf = _docs_fixture(tmp_path, docs, name="sf_ty")
    rows = {r["source"]: r for r in n3_effective_token_yield(spark, sf).collect()}
    a, b = rows["srcA"], rows["srcB"]
    assert a["doc_yield"] == 1.0 and a["token_yield"] == 1.0
    assert b["n_docs"] == 2 and b["n_canonical_docs"] == 1
    assert b["n_tokens"] == 103 and b["canonical_tokens"] == 3
    assert b["doc_yield"] == 0.5
    assert b["token_yield"] == round(3 / 103, 6)


def test_seasonality_strength_extremes(spark, tmp_path):
    """A perfectly weekly series has strength 1; a constant series has
    NULL (zero total variance — the guard, not NaN)."""
    from hadoop_stuff_spark.operators.temporal import (
        seasonality_strength_by_priority,
    )

    pattern = [9, 1, 1, 1, 1, 1, 4]
    counts = [pattern[t % 7] for t in range(70)]
    sf = _orders_fixture(tmp_path, counts, name="sf_seas")
    row = seasonality_strength_by_priority(spark, sf).collect()[0]
    assert row["n_days"] == 70
    assert row["seasonality_strength"] == 1.0

    flat = [5] * 35
    sf2 = _orders_fixture(tmp_path, flat, name="sf_flat")
    row2 = seasonality_strength_by_priority(spark, sf2).collect()[0]
    assert row2["seasonality_strength"] is None


def test_weekly_retention_matrix_planted_churn(spark, tmp_path):
    """Cohort of 4 users in week 0: 2 return in week 1, 1 in week 2, and
    week 3 is fully silent — which must still be an explicit 0 row out
    to the corpus max week (set by a later cohort's activity)."""
    from hadoop_stuff_spark.operators.temporal import weekly_retention_matrix

    wk = 7 * 86_400
    rows = []
    eid = 0

    def ev(uid, week):
        nonlocal eid
        rows.append((uid, "view", 1.0))
        secs.append(week * wk)
        eid += 1

    secs = []
    for uid in (1, 2, 3, 4):
        ev(uid, 0)
    ev(1, 1)
    ev(2, 1)
    ev(1, 2)
    ev(9, 3)  # later cohort keeps the triangle open through offset 3
    n = len(rows)
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [_EPOCH_US + s * 1_000_000 for s in secs], pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / "sf_ret"
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "events.parquet"))
    out = weekly_retention_matrix(spark, str(sf)).collect()
    first = [r for r in out if r["cohort_week"] == min(x["cohort_week"] for x in out)]
    by_k = {r["week_offset"]: r for r in first}
    assert set(by_k) == {0, 1, 2, 3}  # complete triangle incl. silent wk3
    assert by_k[0]["n_cohort"] == 4 and by_k[0]["retention"] == 1.0
    assert by_k[1]["n_active"] == 2 and by_k[1]["retention"] == 0.5
    assert by_k[2]["n_active"] == 1 and by_k[2]["retention"] == 0.25
    assert by_k[3]["n_active"] == 0 and by_k[3]["retention"] == 0.0


def test_dedup_aware_mixture_shift_reallocates(spark, tmp_path):
    """srcB's tokens are mostly copies of srcA's canonical doc: its
    dedup-aware share must DROP (negative shift) and srcA's must rise;
    both share columns sum to 1 within rounding."""
    from hadoop_stuff_spark.operators.dedup import n3_dedup_aware_mixture_shift

    long_text = " ".join(f"w{i}" for i in range(200))
    docs = [
        (1, "srcA", long_text),
        (2, "srcB", long_text),   # duplicate mass inflates srcB's raw count
        (3, "srcB", "tiny unique doc"),
        (4, "srcA", "another unique doc entirely"),
    ]
    sf = _docs_fixture(tmp_path, docs, name="sf_mix")
    rows = {r["source"]: r for r in n3_dedup_aware_mixture_shift(spark, sf).collect()}
    assert rows["srcB"]["share_shift"] < 0 < rows["srcA"]["share_shift"]
    for col in ("raw_share", "dedup_share"):
        assert abs(sum(r[col] for r in rows.values()) - 1.0) < 1e-5
    # canonical mass: srcB keeps only its unique doc's tokens
    assert rows["srcB"]["canonical_tokens"] == 3


def test_per_source_near_dup_rate_lsh_agrees_on_planted(spark, tmp_path):
    """On the planted near-dup fixture the LSH-scale rate must flag the
    same source the exact operator flags, and keep srcB's explicit 0."""
    from hadoop_stuff_spark.operators.dedup import per_source_near_dup_rate_lsh

    near_a = "the quick brown fox jumps over the lazy dog again and again"
    near_b = "the quick brown fox jumps over the lazy dog again and once"
    docs = [
        (1, "srcA", near_a),
        (2, "srcA", near_b),
        (3, "srcB", "structured streaming watermarks drop late arrivals"),
        (4, "srcB", "broadcast joins avoid shuffling the large fact side"),
    ]
    sf = _docs_fixture(tmp_path, docs, name="sf_lshr")
    rows = {
        r["source"]: r for r in per_source_near_dup_rate_lsh(spark, sf).collect()
    }
    assert set(rows) == {"srcA", "srcB"}
    assert rows["srcA"]["n_near_dup"] == 2 and rows["srcA"]["near_dup_rate"] == 1.0
    assert rows["srcB"]["n_near_dup"] == 0 and rows["srcB"]["near_dup_rate"] == 0.0


def test_priority_mix_drift_planted_month(spark, tmp_path):
    """Eleven months share one stable mix; month 12 flips entirely to a
    priority the rest of the corpus barely uses — its PSI must dominate
    every stable month's, and absent (month, priority) cells must count
    (the zero-cell rule: the drifted month has ZERO of the common
    priority)."""
    from hadoop_stuff_spark.operators.profile import priority_mix_drift_by_month

    from datetime import datetime, timezone

    dates, prios = [], []
    for m in range(12):
        for i in range(30):
            dt = datetime(2001, m + 1, (i % 28) + 1, tzinfo=timezone.utc)
            dates.append(int(dt.timestamp()) * 1_000_000)
            prios.append("5-LOW" if m == 11 else "1-URGENT")
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(dates)
    table = pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array([1] * n, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n),
            "o_totalprice": pa.array([10.0] * n, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(prios),
        }
    )
    sf = tmp_path / "sf_pmix"
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "orders.parquet"))
    out = priority_mix_drift_by_month(spark, str(sf)).collect()
    assert len(out) == 12
    psis = {r["order_month"]: r["psi"] for r in out}
    # the flipped month (2001-12) carries by far the largest PSI; the
    # stable months all share ONE value (their mix differs from the
    # corpus only by the drifted month's mass in the corpus marginal)
    rest = [v for k, v in psis.items() if k != 200112]
    assert psis[200112] > 4 * max(rest)
    assert len(set(rest)) == 1
