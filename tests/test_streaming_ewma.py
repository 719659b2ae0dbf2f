"""Streaming EWMA anomaly detector: the emitted anomaly set equals a
scalar reference fold of the same recurrence, for ANY micro-batch split
of an in-order stream (batch-independence — no timers, no watermark)."""

import math
import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    exactly_once_parquet_sink,
    streaming_ewma_anomaly,
)
from hadoop_stuff_spark.streaming.tail import tail_stream

BASE = 1_700_000_000  # epoch seconds

ALPHA, K, MIN_OBS = 0.25, 3.0, 5


def _reference_fold(events):
    """(uid, sec, eid, value) → list of (uid, sec, value, n_prior) anomaly
    keys, the operator's recurrence run as one plain loop per user."""
    out = []
    state = {}
    for uid, sec, _eid, x in sorted(events):
        n, ema, ewvar = state.get(uid, (0, 0.0, 0.0))
        if n >= MIN_OBS:
            dev = x - ema
            if ewvar > 0.0:
                if abs(dev / math.sqrt(ewvar)) > K:
                    out.append((uid, sec, x, n))
            elif dev != 0.0:
                out.append((uid, sec, x, n))
        if n == 0:
            ema, ewvar = x, 0.0
        else:
            delta = x - ema
            ema = ema + ALPHA * delta
            ewvar = (1.0 - ALPHA) * (ewvar + ALPHA * delta * delta)
        state[uid] = (n + 1, ema, ewvar)
    return sorted(out)


def _write_log(directory, name, events):
    with open(os.path.join(directory, name), "w") as f:
        f.write(
            "\n".join(f"{u} {s} {e} {v}" for u, s, e, v in events) + "\n"
        )


def _timed(stream):
    p = F.split(F.col("value"), " ")
    return stream.select(
        p[0].cast("long").alias("user_id"),
        F.to_timestamp(p[1].cast("long")).alias("ts"),
        p[2].cast("long").alias("event_id"),
        p[3].cast("double").alias("value"),
    )


def _run_split(spark, tmp_path, tag, batches):
    logdir = str(tmp_path / f"logs_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    outdir = str(tmp_path / f"out_{tag}")
    os.makedirs(logdir)
    for i, batch in enumerate(batches):
        _write_log(logdir, f"b{i}.txt", batch)
        q = (
            streaming_ewma_anomaly(
                _timed(tail_stream(spark, logdir)),
                alpha=ALPHA,
                k=K,
                min_obs=MIN_OBS,
            )
            .writeStream.foreachBatch(exactly_once_parquet_sink(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = spark.read.parquet(outdir).collect()
    return sorted(
        (r["user_id"], int(r["ts"].timestamp()), r["value"], r["n_prior"])
        for r in rows
    ), rows


def test_streaming_anomalies_match_reference_for_any_batch_split(
    spark, tmp_path
):
    """u1 is constant through burn-in (zero-variance branch: the spike
    flags with NULL z); u2 alternates (finite variance: the jump flags
    with |z| > k while the alternation itself stays under k); neither
    user flags during burn-in. The same event set split at DIFFERENT
    micro-batch boundaries emits the identical anomaly set."""
    eid = iter(range(10_000))
    u1 = [(1, BASE + 10 * i, next(eid), 10.0) for i in range(8)]
    u1.append((1, BASE + 100, next(eid), 100.0))  # spike on constant signal
    u1.append((1, BASE + 110, next(eid), 10.0))  # post-spike return
    u2 = [
        (2, BASE + 10 * i, next(eid), 10.0 + 2.0 * (i % 2)) for i in range(10)
    ]
    u2.append((2, BASE + 150, next(eid), 50.0))  # jump, finite variance
    u2.append((2, BASE + 160, next(eid), 11.0))  # back to normal band
    events = sorted(u1 + u2)

    expected = _reference_fold(events)
    assert len(expected) >= 2  # the fixture really plants anomalies

    got_a, rows_a = _run_split(spark, tmp_path, "a", [events])
    got_b, rows_b = _run_split(
        spark, tmp_path, "b", [events[:5], events[5:12], events[12:]]
    )
    assert got_a == expected
    assert got_b == expected

    by_user = {}
    for r in rows_b:
        by_user.setdefault(r["user_id"], []).append(r)
    # u1's spike fired on the zero-variance branch: z is the NULL guard
    assert all(r["z"] is None for r in by_user[1])
    # u2's jump carries a finite z beyond k
    assert all(r["z"] is not None and abs(r["z"]) > K for r in by_user[2])
    # no anomaly ever emitted inside the burn-in window
    assert all(r["n_prior"] >= MIN_OBS for r in rows_a)
