"""As-of join and range join (operators/temporal.py).

Value oracles: pandas.merge_asof for asof_join, a brute-force cross+filter
for range_join. Plan oracle: range_join must plan an equi-join on the
bucket key, never BroadcastNestedLoopJoin/CartesianProduct.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.temporal import asof_join, range_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    """Random trades (left) and quotes (right) per symbol, seeded."""
    rng = np.random.default_rng(7)
    n_keys, n_trades, n_quotes = 5, 400, 300
    trades = pd.DataFrame(
        {
            "sym": rng.integers(0, n_keys, n_trades),
            "ts": [_ts(s) for s in np.sort(rng.uniform(0, 3600, n_trades))],
            "trade_id": np.arange(n_trades),
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": rng.integers(0, n_keys, n_quotes),
            "ts": [_ts(s) for s in np.sort(rng.uniform(0, 3600, n_quotes))],
            "quote_id": np.arange(n_quotes),
            "px": np.round(rng.uniform(1, 100, n_quotes), 2),
        }
    )
    return spark.createDataFrame(trades), spark.createDataFrame(quotes), trades, quotes


def _expected_asof(trades, quotes, tolerance=None):
    exp = pd.merge_asof(
        trades.sort_values("ts"),
        quotes.sort_values("ts"),
        on="ts",
        by="sym",
        direction="backward",
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
    )
    return exp


def test_asof_join_matches_pandas_merge_asof(spark, trades_quotes):
    t_df, q_df, trades, quotes = trades_quotes
    got = (
        asof_join(
            t_df, q_df, on=["sym"], right_cols=["quote_id", "px"],
            right_tiebreak="quote_id", how="left",
        )
        .select("trade_id", "asof_quote_id")
        .toPandas()
        .set_index("trade_id")["asof_quote_id"]
        .sort_index()
    )
    exp = _expected_asof(trades, quotes).set_index("trade_id")["quote_id"].sort_index()
    assert len(got) == len(trades)
    pd.testing.assert_series_equal(
        got, exp, check_names=False, check_dtype=False
    )


def test_asof_join_inner_drops_unmatched(spark, trades_quotes):
    t_df, q_df, trades, quotes = trades_quotes
    got = asof_join(
        t_df, q_df, on=["sym"], right_cols=["quote_id"],
        right_tiebreak="quote_id", how="inner",
    )
    exp = _expected_asof(trades, quotes)
    assert got.count() == int(exp["quote_id"].notna().sum())
    assert got.filter(F.col("asof_ts").isNull()).count() == 0


def test_asof_join_tolerance(spark, trades_quotes):
    t_df, q_df, trades, quotes = trades_quotes
    tol = 30.0
    got = asof_join(
        t_df, q_df, on=["sym"], right_cols=["quote_id"],
        right_tiebreak="quote_id", how="inner", tolerance_seconds=tol,
    )
    exp = _expected_asof(trades, quotes, tolerance=tol)
    assert got.count() == int(exp["quote_id"].notna().sum())


def test_asof_join_equal_ts_matches_and_tiebreak(spark):
    """A right row at exactly the left timestamp matches (>= semantics);
    among duplicate right timestamps the greatest tiebreak wins."""
    left = spark.createDataFrame([(1, _ts(10), "L")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(10), 101), (1, _ts(4), 7)],
        "k int, ts timestamp, rid int",
    )
    row = asof_join(
        left, right, on=["k"], right_cols=["rid"], right_tiebreak="rid"
    ).collect()[0]
    assert row.asof_ts == _ts(10)
    assert row.asof_rid == 101


def test_asof_join_left_ts_single_column_and_selectable(spark, trades_quotes):
    """ADVICE r1: the left timestamp must appear exactly once in the output
    schema, and selecting/filtering on it must not raise
    AMBIGUOUS_REFERENCE."""
    t_df, q_df, _, _ = trades_quotes
    out = asof_join(
        t_df, q_df, on=["sym"], right_cols=["quote_id", "px"],
        right_tiebreak="quote_id", how="left",
    )
    assert out.columns.count("ts") == 1
    # both of these threw AMBIGUOUS_REFERENCE before the fix
    assert out.select("ts").count() == out.count()
    assert out.filter(F.col("ts") >= _ts(0)).count() == out.count()


def test_asof_join_matched_row_null_payload_stays_null(spark):
    """ADVICE r1: a NULL payload field in the MATCHED right row must come
    through as NULL — not be back-filled from an older right row
    (pandas merge_asof / DuckDB ASOF semantics: values come from the one
    matched row)."""
    left = spark.createDataFrame([(1, _ts(20), "L")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(5), 7, 99.0), (1, _ts(15), 8, None)],
        "k int, ts timestamp, rid int, px double",
    )
    row = asof_join(
        left, right, on=["k"], right_cols=["rid", "px"], right_tiebreak="rid"
    ).collect()[0]
    assert row.asof_ts == _ts(15)
    assert row.asof_rid == 8
    assert row.asof_px is None  # matched row's NULL, not 99.0 carried forward


def test_range_join_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    points = pd.DataFrame(
        {
            "p_id": np.arange(500),
            "p_ts": [_ts(s) for s in rng.uniform(0, 7200, 500)],
        }
    )
    starts = rng.uniform(0, 7200, 80)
    widths = rng.uniform(10, 900, 80)  # widths both below and above bucket
    intervals = pd.DataFrame(
        {
            "iv_id": np.arange(80),
            "start": [_ts(s) for s in starts],
            "end": [_ts(s + w) for s, w in zip(starts, widths)],
        }
    )
    got = (
        range_join(
            spark.createDataFrame(points),
            spark.createDataFrame(intervals),
            "p_ts", "start", "end", bucket_seconds=300,
        )
        .select("iv_id", "p_id")
        .toPandas()
    )
    exp = intervals.merge(points, how="cross")
    exp = exp[(exp.p_ts >= exp.start) & (exp.p_ts < exp.end)][["iv_id", "p_id"]]
    got_set = set(map(tuple, got.itertuples(index=False)))
    exp_set = set(map(tuple, exp.itertuples(index=False)))
    assert got_set == exp_set
    assert len(got) == len(got_set)  # no duplicate pairs from bucket explode


def test_range_join_plan_is_equi_join(spark):
    """The 100 TB guarantee: bucketing turns the range predicate into an
    equi-join — no BroadcastNestedLoopJoin / CartesianProduct in the plan."""
    points = spark.createDataFrame([(1, _ts(5))], "p_id int, p_ts timestamp")
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(600))], "iv_id int, start timestamp, end timestamp"
    )
    plan = (
        range_join(points, intervals, "p_ts", "start", "end", bucket_seconds=300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_plan_single_shuffle(spark, trades_quotes):
    """asof_join is the union+window form: exactly one hash Exchange on the
    key (plus the union inputs), never a join amplification."""
    t_df, q_df, _, _ = trades_quotes
    plan = (
        asof_join(t_df, q_df, on=["sym"], right_cols=["px"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1


def test_ema_whale_user_streams_without_per_user_array(spark, tmp_path):
    """VERDICT r6 #2 regression: one whale key (1M events) must stream
    through the sorted-partition fold — the plan carries MapInPandas and
    NO per-user collect_list array. Constant whale values pin the fold's
    seed+recurrence exactly (EMA of a constant is the constant); a small
    user alongside pins the hand-computed recurrence and the tie-free
    (ts, event_id) order."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_stuff_spark.operators.temporal import ema_event_values

    n_whale = 1_000_000
    base_ns = 1_700_000_000 * 1_000_000_000
    user_ids = [1] * n_whale + [2, 2, 2]
    values = [2.5] * n_whale + [1.0, 2.0, 4.0]
    n = len(user_ids)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base_ns + i * 1_000_000 for i in range(n)], pa.timestamp("ns")
            ),
            "user_id": pa.array(user_ids, pa.int64()),
            "event_type": pa.array(["t"] * n),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / "sf_whale"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))

    out_df = ema_event_values(spark, str(sf))
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    assert "collect_list" not in plan, plan  # the whale-OOM shape is gone

    out = {r["user_id"]: r for r in out_df.collect()}
    assert out[1]["n_events"] == n_whale
    assert out[1]["ema_value"] == 2.5  # EMA of a constant is the constant
    assert out[1]["last_value"] == 2.5
    # hand fold for user 2: 1.0 -> 2*0.25+1*0.75 = 1.25 -> 4*0.25+1.25*0.75
    assert out[2]["n_events"] == 3
    assert out[2]["ema_value"] == pytest.approx(1.9375)
    assert out[2]["last_value"] == 4.0


def test_ema_null_value_poisons_user(spark, tmp_path):
    """A NULL value anywhere in a user's history must make that user's
    ema NULL (the list_reduce/HOF propagation rule the oracle mirrors),
    while other users are untouched."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_stuff_spark.operators.temporal import ema_event_values

    base_ns = 1_700_000_000 * 1_000_000_000
    table = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(
                [base_ns + i * 1_000_000_000 for i in range(5)], pa.timestamp("ns")
            ),
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["t"] * 5),
            "value": pa.array([1.0, None, 3.0, 5.0, 7.0], pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    sf = tmp_path / "sf_emanull"
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))

    out = {r["user_id"]: r for r in ema_event_values(spark, str(sf)).collect()}
    assert out[1]["ema_value"] is None
    assert out[1]["n_events"] == 3
    assert out[1]["last_value"] == 3.0
    assert out[2]["ema_value"] == pytest.approx(5.5)  # 7*0.25 + 5*0.75
