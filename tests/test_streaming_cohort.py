"""Streaming cohort-activity tracker vs the batch retention matrix: for
an in-event-time-order stream, grouping the emitted (cohort_week,
week_offset) rows reproduces the batch operator's nonzero numerators
exactly, for ANY micro-batch split; a (user, week) pair active twice is
emitted once."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    exactly_once_parquet_sink,
    streaming_cohort_activity,
)
from hadoop_stuff_spark.streaming.tail import tail_stream

_EPOCH_US = 1_000_000_000 * 1_000_000
_WK_S = 7 * 86_400

# (uid, week) activity; uid 1 active twice in week 0 (dedup check)
_EVENTS = [
    (1, 0), (1, 0), (2, 0), (3, 0), (4, 0),
    (1, 1), (2, 1),
    (1, 2),
    (9, 3),
]


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
            streaming_cohort_activity(_typed(tail_stream(spark, logdir)))
            .writeStream.outputMode("append")
            .foreachBatch(exactly_once_parquet_sink(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow run did not finish"
    out = spark.read.parquet(outdir)
    return sorted(
        (r["user_id"], r["cohort_week"], r["week_offset"]) for r in out.collect()
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
    sf = tmp_path / "sf_coh"
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


def test_stream_reproduces_batch_retention_numerators(spark, tmp_path):
    rows = _run(spark, tmp_path, "eq", [_EVENTS])
    # one emission per distinct (user, week): uid 1's double week-0 dedups
    assert len(rows) == len({(u, w) for u, w in _EVENTS})
    from collections import Counter

    stream_counts = Counter((c, k) for _, c, k in rows)
    from hadoop_stuff_spark.operators.temporal import weekly_retention_matrix

    sf = _batch_fixture(tmp_path)
    batch = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in weekly_retention_matrix(spark, sf).collect()
        if r["n_active"] > 0
    }
    # same week INDEX convention: both are days-since-1970 div 7
    assert dict(stream_counts) == batch


def test_stream_cohort_batch_split_invariant(spark, tmp_path):
    one = _run(spark, tmp_path, "one", [_EVENTS])
    # the middle batch REPEATS (1, 0) from batch one: the cross-batch
    # (user, week) dedup — the whole reason weeks_seen is keyed state —
    # must swallow it (r10 review: in-batch dedup alone would pass the
    # plain split)
    three = _run(
        spark,
        tmp_path,
        "three",
        [_EVENTS[:4], [(1, 0)] + _EVENTS[4:7], _EVENTS[7:]],
    )
    assert one == three


def test_stream_cohort_null_ts_does_not_poison_state(spark, tmp_path):
    """A malformed line (unparseable ts → NaT) must produce NO emission
    and leave NO state: the user's cohort is set by their first REAL
    event, not by int64-min garbage (the NaT→week -15251 trap)."""
    logdir = str(tmp_path / "logs_nat")
    ckpt = str(tmp_path / "ckpt_nat")
    outdir = str(tmp_path / "out_nat")
    os.makedirs(logdir)
    base = _EPOCH_US // 1_000_000

    def _typed_lenient(stream):
        # a production parser NULLs malformed rows instead of crashing
        # (ANSI cast would throw on the junk string before NaT exists)
        p = F.split(F.col("value"), " ")
        return stream.select(
            p[0].cast("long").alias("user_id"),
            F.to_timestamp(F.expr("try_cast(split(value, ' ')[1] AS LONG)")).alias(
                "ts"
            ),
        )

    for i, lines in enumerate(
        [["5 not_a_ts"], [f"5 {base + 2 * _WK_S}"]]
    ):
        with open(os.path.join(logdir, f"b{i}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        q = (
            streaming_cohort_activity(_typed_lenient(tail_stream(spark, logdir)))
            .writeStream.outputMode("append")
            .foreachBatch(exactly_once_parquet_sink(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    rows = [
        (r["user_id"], r["cohort_week"], r["week_offset"])
        for r in spark.read.parquet(outdir).collect()
    ]
    wk = (base * 1000 + 2 * _WK_S * 1000) // (7 * 86_400_000)
    assert rows == [(5, wk, 0)]
