"""Property-based tests for the round-9 series operators: each operator
is checked against an independent brute-force Python reference on random
planted daily series (SURVEY.md §5.2 #4 applied to the analytics layer).
Fixtures are written per example via tempfile (hypothesis reuses pytest
fixtures across examples, so tmp_path cannot be)."""

import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st
import pytest

# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow


def _orders_sf(day_counts, priority="1-URGENT"):
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
    sf = tempfile.mkdtemp(prefix="w9prop_")
    pq.write_table(table, os.path.join(sf, "orders.parquet"))
    return sf


series_st = st.lists(st.integers(1, 9), min_size=3, max_size=22)


@settings(max_examples=8, deadline=None)
@given(series_st)
def test_changepoint_matches_bruteforce_argmax(spark, counts):
    """The operator's split equals the brute-force argmax of
    D_i²/(i·(n−i)) with the (score desc, earliest day) tie-break, and
    the reported means are the exact left/right averages."""
    from hadoop_stuff_spark.operators.temporal import changepoint_daily_orders

    sf = _orders_sf(counts)
    r = changepoint_daily_orders(spark, sf).collect()[0]

    n = len(counts)
    s = 0
    s_n = sum(counts)
    best = None  # (score, i)
    for i, c in enumerate(counts[:-1], start=1):
        s += c
        d = s * n - i * s_n
        score = (d * d) / (i * (n - i))
        if best is None or score > best[0] + 0.0:
            if best is None or score > best[0]:
                best = (score, i)
    i = best[1]
    assert r["n_left"] == i and r["n_right"] == n - i
    assert r["mean_left"] == round(sum(counts[:i]) / i, 6)
    assert r["mean_right"] == round(sum(counts[i:]) / (n - i), 6)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.one_of(st.integers(1, 9), st.none()), min_size=16, max_size=24))
def test_forecast_backtest_matches_reference_fold(spark, counts):
    """MAE/RMSE/bias for all three methods equal a plain-Python reference
    over the calendar-densified series (gap days = 0), exactly."""
    from hadoop_stuff_spark.operators.temporal import (
        forecast_backtest_daily_orders,
    )

    if all(c is None for c in counts):
        return
    # trim leading/trailing gaps: the operator's calendar starts at the
    # first observed day and ends at the last
    lo = next(i for i, c in enumerate(counts) if c is not None)
    hi = max(i for i, c in enumerate(counts) if c is not None)
    dense = [c or 0 for c in counts[lo : hi + 1]]
    if len(dense) <= 8:
        return

    sf = _orders_sf(counts)
    got = {r["method"]: r for r in forecast_backtest_daily_orders(spark, sf).collect()}

    errs = {"naive": [], "seasonal_naive": [], "ma7": []}
    for t in range(7, len(dense)):
        a = dense[t]
        errs["naive"].append(7 * (a - dense[t - 1]))
        errs["seasonal_naive"].append(7 * (a - dense[t - 7]))
        errs["ma7"].append(7 * a - sum(dense[t - 7 : t]))
    for method, es in errs.items():
        r = got[method]
        ne = len(es)
        assert r["n_days"] == ne
        assert r["mae"] == round(sum(abs(e) for e in es) / (7.0 * ne), 6)
        assert r["rmse"] == round(
            math.sqrt(sum(e * e for e in es) / (49.0 * ne)), 6
        )
        assert r["bias"] == round(sum(es) / (7.0 * ne), 6)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(1, 9), min_size=4, max_size=20), st.integers(1, 5))
def test_acf_matches_integer_sum_reference(spark, counts, max_lag):
    """Each lag's r equals the exact integer-sum Pearson reference; every
    defined acf lies in [−1, 1]."""
    from hadoop_stuff_spark.operators.temporal import acf_daily_orders

    sf = _orders_sf(counts)
    rows = {r["lag"]: r for r in acf_daily_orders(spark, sf, max_lag=max_lag).collect()}
    assert set(rows) == set(range(1, max_lag + 1))
    for k in range(1, max_lag + 1):
        pairs = [(counts[t], counts[t - k]) for t in range(k, len(counts))]
        r = rows[k]
        if not pairs:
            assert r["n_pairs"] == 0
            continue
        assert r["n_pairs"] == len(pairs)
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx > 0 and vy > 0:
            expect = round((n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy)), 6)
            assert r["acf"] == expect
            assert -1.0 <= r["acf"] <= 1.0
        else:
            assert r["acf"] is None
