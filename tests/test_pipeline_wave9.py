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
    # split_date is the LAST day of the left regime (day offset 29)
    assert r["split_date"].day - rows[0]["split_date"].day == 0  # sanity
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
