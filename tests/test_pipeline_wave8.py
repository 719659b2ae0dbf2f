"""Round-8 wave tests: session-path whale cap, oracle type hygiene,
and the round's new operators."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest  # noqa: F401


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


def test_session_path_whale_session_is_capped_not_collected(spark, tmp_path):
    """VERDICT r7 #2: an always-on bot (events every 60 s, never a
    30-min silence) is ONE session whose naive collect_list is an
    unbounded single-row array.  With the rank cap, the whale's path
    carries exactly max_events entries, truncation is reported, and
    the plan ranks BEFORE it collects (row_number + conditional
    collect_list), so the aggregation buffer is bounded."""
    from hadoop_stuff_spark.operators.temporal import session_path_topk

    whale = [(1, f"e{i % 7}", i * 60.0) for i in range(5000)]  # no gap ever
    small = [(2, "view", 0.0), (2, "click", 60.0)]
    sf = _events_typed_fixture(tmp_path, whale + small, "sf_whale")

    df = session_path_topk(spark, sf, max_events=16)
    out = {r["path"]: r for r in df.collect()}
    assert len(out) == 2
    whale_path = ">".join(f"e{i % 7}" for i in range(16))
    assert whale_path in out
    assert out[whale_path]["path_len"] == 16
    assert out[whale_path]["n_truncated"] == 1
    assert out["view>click"]["n_truncated"] == 0

    # plan shape: the rank-cap must be real — a window row_number feeds a
    # CASE-gated collect_list (nulls skipped → bounded buffer), never a
    # bare collect_list over the whole session.
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan
    assert "collect_list(case when" in plan.lower()
    assert "collect_list(struct" not in plan.lower()


def test_session_path_default_cap_matches_oracle_with_truncation(spark, tmp_path):
    """Parity is not oracle-for-default-only here: the SQL mirrors the
    rank cutoff, so a fixture that actually truncates (a 70-event
    no-gap session vs the default cap 64) must agree engine-vs-oracle
    cell for cell."""
    import duckdb

    from hadoop_stuff_spark.operators.temporal import (
        SESSION_PATH_SQL,
        session_path_topk,
    )

    rows = [(1, f"t{i % 3}", i * 60.0) for i in range(70)] + [
        (2, "view", 0.0),
        (2, "click", 60.0),
    ]
    sf = _events_typed_fixture(tmp_path, rows, "sf_trunc")
    got = sorted(tuple(r) for r in session_path_topk(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(SESSION_PATH_SQL).fetchall())
    con.close()
    assert got == want
    # and the whale row really did truncate at 64
    trunc = [r for r in got if r[1] == 64]
    assert trunc and trunc[0][3] == 1
