"""Streaming growth-accounting lifecycle vs the batch matrix: for an
in-event-time-order stream, grouping the emitted (wk, status) rows
reproduces user_lifecycle_weekly's new/retained/resurrected counts
exactly and its churned counts restricted to users who later resurrect
(terminal churn needs the corpus horizon only batch sees); emissions are
invariant to the micro-batch split (each availableNow run restarts from
the checkpoint, so the split test is also the restore test)."""

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    exactly_once_parquet_sink,
    streaming_user_lifecycle,
)
from hadoop_stuff_spark.streaming.tail import tail_stream

_EPOCH_US = 1_000_000_000 * 1_000_000
_WK_S = 7 * 86_400

# (uid, week): uid 1 runs three straight weeks (double-active in week 0 —
# dedup check); uid 2 and uid 4 churn and resurrect (gap sizes 2 and 2,
# starting at different weeks); uid 3 is one-and-done (terminal churn —
# batch-only knowledge)
_EVENTS = [
    (1, 0), (1, 0), (2, 0), (3, 0),
    (1, 1), (4, 1),
    (1, 2), (4, 2),
    (2, 3),
    (4, 5),
]

# weeks emit as ABSOLUTE indexes (days-since-1970 div 7); the fixture
# writes events at base + w weeks, so expectations shift by the base week
_BASE_WK = (_EPOCH_US // 1_000) // (7 * 86_400_000)

_EXPECTED = sorted(
    (u, _BASE_WK + w, st)
    for u, w, st in [
        (1, 0, "new"), (1, 1, "retained"), (1, 2, "retained"),
        (2, 0, "new"), (2, 1, "churned"), (2, 3, "resurrected"),
        (3, 0, "new"),
        (4, 1, "new"), (4, 2, "retained"),
        (4, 3, "churned"), (4, 5, "resurrected"),
    ]
)


def _write_log(directory, name, events):
    with open(os.path.join(directory, name), "w") as f:
        f.write(
            "\n".join(
                f"{u} {_EPOCH_US // 1_000_000 + w * _WK_S}" for u, w in events
            )
            + "\n"
        )


def _typed(stream):
    p = F.split(F.col("value"), " ")
    return stream.select(
        p[0].cast("long").alias("user_id"),
        F.to_timestamp(p[1].cast("long")).alias("ts"),
    )


def _run(spark, tmp_path, tag, batches):
    logdir = str(tmp_path / f"logs_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    outdir = str(tmp_path / f"out_{tag}")
    os.makedirs(logdir)
    for i, batch in enumerate(batches):
        _write_log(logdir, f"b{i}.txt", batch)
        q = (
            streaming_user_lifecycle(_typed(tail_stream(spark, logdir)))
            .writeStream.outputMode("append")
            .foreachBatch(exactly_once_parquet_sink(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow run did not finish"
    out = spark.read.parquet(outdir)
    return sorted(
        (r["user_id"], r["wk"], r["status"]) for r in out.collect()
    )


def _batch_fixture(tmp_path):
    n = len(_EVENTS)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [_EPOCH_US + w * _WK_S * 1_000_000 for _, w in _EVENTS],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _ in _EVENTS], pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / "sf_lc"
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_stream_lifecycle_expected_rows(spark, tmp_path):
    """Full per-user classification against an independently hand-derived
    expectation (not the batch operator — two different formulas)."""
    assert _run(spark, tmp_path, "rows", [_EVENTS]) == _EXPECTED


def test_stream_lifecycle_matches_batch_matrix(spark, tmp_path):
    rows = _run(spark, tmp_path, "eq", [_EVENTS])
    stream_counts = Counter((wk, st) for _, wk, st in rows)

    from hadoop_stuff_spark.operators.temporal import user_lifecycle_weekly

    batch = {
        r["wk"]: r for r in user_lifecycle_weekly(
            spark, _batch_fixture(tmp_path)
        ).collect()
    }
    weeks = sorted({w for _, w in _EVENTS})
    for wk_rel in range(weeks[0], weeks[-1] + 1):
        wk = _BASE_WK + wk_rel
        b = batch[wk]
        for st, col in [
            ("new", "n_new"),
            ("retained", "n_retained"),
            ("resurrected", "n_resurrected"),
        ]:
            assert stream_counts.get((wk, st), 0) == b[col], (wk, st)

    # churn parity holds on the resurrection-revealed subset: per user,
    # every gap between consecutive active weeks churns at prev+1
    # (computed here by a third, plain-Python formula)
    expected_churn: Counter = Counter()
    by_user: dict = {}
    for u, w in _EVENTS:
        by_user.setdefault(u, set()).add(w)
    for u, ws in by_user.items():
        ws = sorted(ws)
        for a, b in zip(ws, ws[1:]):
            if b > a + 1:
                expected_churn[_BASE_WK + a + 1] += 1
    assert {
        wk: n for (wk, st), n in stream_counts.items() if st == "churned"
    } == dict(expected_churn)
    # and batch churn is always >= stream churn (it adds terminal churn)
    for wk, n in expected_churn.items():
        assert batch[wk]["n_churned"] >= n


def test_stream_lifecycle_batch_split_invariant(spark, tmp_path):
    one = _run(spark, tmp_path, "one", [_EVENTS])
    # middle batch REPEATS (1, 0): the frontier in keyed state must
    # swallow the cross-batch duplicate (in-batch dedup alone would
    # pass a plain split); each loop iteration restarts the query from
    # the checkpoint, so this is also the restore test
    three = _run(
        spark,
        tmp_path,
        "three",
        [_EVENTS[:4], [(1, 0)] + _EVENTS[4:8], _EVENTS[8:]],
    )
    assert one == three == _EXPECTED


def test_stream_lifecycle_null_ts_does_not_poison_state(spark, tmp_path):
    """A malformed line (NaT after try_cast) must emit nothing and leave
    no frontier: the user's first REAL event is still 'new' (the
    NaT→int64-min trap would otherwise make it 'resurrected')."""
    logdir = str(tmp_path / "logs_nat")
    ckpt = str(tmp_path / "ckpt_nat")
    outdir = str(tmp_path / "out_nat")
    os.makedirs(logdir)
    base = _EPOCH_US // 1_000_000

    def _typed_lenient(stream):
        return stream.select(
            F.split(F.col("value"), " ")[0].cast("long").alias("user_id"),
            F.to_timestamp(
                F.expr("try_cast(split(value, ' ')[1] AS LONG)")
            ).alias("ts"),
        )

    for i, lines in enumerate([["5 not_a_ts"], [f"5 {base + 2 * _WK_S}"]]):
        with open(os.path.join(logdir, f"b{i}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        q = (
            streaming_user_lifecycle(_typed_lenient(tail_stream(spark, logdir)))
            .writeStream.outputMode("append")
            .foreachBatch(exactly_once_parquet_sink(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    rows = [
        (r["user_id"], r["wk"], r["status"])
        for r in spark.read.parquet(outdir).collect()
    ]
    wk = (base * 1000 + 2 * _WK_S * 1000) // (7 * 86_400_000)
    assert rows == [(5, wk, "new")]
