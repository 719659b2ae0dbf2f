"""Regression tests for the round-8 ADVICE items."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest  # noqa: F401


def _events_us_fixture(tmp_path, rows, name):
    """(user_id, event_type, value, micros-offset) rows at exact
    microsecond timestamps — the PSI midpoint boundary needs us-level
    control that second-resolution fixtures can't give."""
    base_us = 1_700_000_000 * 1_000_000
    n = len(rows)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base_us + int(r[3]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_psi_midpoint_floor_division_on_both_engines(spark, tmp_path):
    """ADVICE r8 #1: with min+max micros ODD, Spark's old `/2
    cast('long')` TRUNCATED while the oracle's CAST(... AS BIGINT)
    ROUNDED — mid_micros differed by 1 us and the event planted exactly
    on the boundary flipped early/late between engines.  Both sides now
    floor-divide; the boundary event must land in the same half on
    both, cell for cell."""
    from hadoop_stuff_spark.operators.profile import (
        VALUE_DRIFT_PSI_SQL,
        value_drift_psi,
    )

    # span = [0, 1_000_003] us → sum odd → floor mid = 500_001 (an ODD
    # floor, so round-half-to-even AND round-half-up both give 500_002 —
    # the old trunc-vs-round divergence is exposed whichever rounding
    # mode the oracle uses)
    rows = [
        (1, "a", 0.0, 0),
        (1, "a", 1.0, 500_001),    # == mid → early (not strictly late)
        (1, "a", 2.0, 500_002),    # mid + 1 → late under floor on BOTH
        (1, "a", 3.0, 1_000_003),
        (2, "b", 5.0, 10),
        (2, "b", 6.0, 999_999),
    ]
    sf = _events_us_fixture(tmp_path, rows, "sf_psi_mid")
    got = sorted(tuple(r) for r in value_drift_psi(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(VALUE_DRIFT_PSI_SQL).fetchall()
    )
    con.close()
    assert got == want
    # the split itself: type 'a' must be 2 early / 2 late on the engine
    early = {r[0]: (r[1], r[2]) for r in got}
    assert early["a"] == (2, 2)


def test_streaming_first_touch_same_ts_tie_credits_touch(spark, tmp_path):
    """ADVICE r8 #2: a same-timestamp touch+purchase where the purchase
    holds the LOWER event_id must still credit the touch (the batch
    operator's _side convention: touches order before conversions at
    equal ts).  The old (ts, event_id) sort replayed the purchase first
    and attributed 'none'."""
    d = tmp_path / "ft_tie" / "events.parquet"
    os.makedirs(d)
    base = 1_700_000_000 * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([5, 9], pa.int64()),
                "ts": pa.array([base + 100, base + 100], pa.timestamp("us")),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["purchase", "view"]),
                "value": pa.array([1.0, 1.0], pa.float64()),
                "props": pa.array(["{}", "{}"]),
            }
        ),
        str(d / "f0.parquet"),
    )
    from hadoop_stuff_spark.streaming.stateful import streaming_first_touch

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(str(d))
    q = (
        streaming_first_touch(stream)
        .writeStream.format("memory")
        .queryName("ft_tie")
        .option("checkpointLocation", str(tmp_path / "ft_tie_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM ft_tie").collect()
    assert len(rows) == 1
    assert rows[0]["first_touch_type"] == "view"
    assert rows[0]["hours_to_convert"] == 0.0
