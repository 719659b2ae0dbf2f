"""Streaming gaps-and-islands sessionizer: closed sessions equal the
batch sessionize() groups row for row; interior gaps close via the DATA
path (batch-independence), the final open session via the watermark
timer."""

import os


from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    exactly_once_parquet_sink,
    streaming_sessionize,
)
from hadoop_stuff_spark.streaming.tail import tail_stream

BASE = 1_700_000_000  # epoch seconds


def _write_log(directory: str, name: str, lines: list[str]) -> None:
    with open(os.path.join(directory, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _timed(stream):
    parts = F.split(F.col("value"), " ")
    return stream.select(
        parts[0].cast("long").alias("user_id"),
        F.to_timestamp(parts[1].cast("long")).alias("ts"),
    )


def _run(spark, logdir, ckpt, outdir):
    q = (
        streaming_sessionize(_timed(tail_stream(spark, logdir)))
        .writeStream.foreachBatch(exactly_once_parquet_sink(outdir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_streaming_sessions_match_batch_sessionizer(spark, tmp_path):
    """u1's first session spans micro-batches; u2's and u3's interior
    gaps are data-revealed (u3's wholly INSIDE one batch — the backfill
    case a timer can never see); the final open sessions of u1/u2/u3
    close via the watermark timer once u99 pushes event time forward.
    The closed-session set must equal the batch sessionizer's groups."""
    logdir = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    os.makedirs(logdir)

    # event time stays monotone ACROSS batches (watermark delay 0: a
    # continuation arriving after the watermark passed it would be LATE
    # data, and the open session legitimately times out first)
    _write_log(
        logdir,
        "b0.txt",
        [f"1 {BASE}", f"1 {BASE + 60}", f"1 {BASE + 120}", f"2 {BASE}"],
    )
    _run(spark, logdir, ckpt, outdir)
    _write_log(logdir, "b1.txt", [f"1 {BASE + 200}", f"2 {BASE + 4000}"])
    _run(spark, logdir, ckpt, outdir)
    # u3: a backfill whose interior gap sits wholly INSIDE this batch —
    # the case an event-time timer can never see (the stateful-timer
    # rule); u1's new session starts in the same batch
    _write_log(
        logdir,
        "b2.txt",
        [
            f"1 {BASE + 5000}",
            f"3 {BASE + 4100}",
            f"3 {BASE + 4160}",
            f"3 {BASE + 7000}",
        ],
    )
    _run(spark, logdir, ckpt, outdir)
    # nudge event time far forward so every open session's timer fires
    _write_log(logdir, "b3.txt", [f"99 {BASE + 20000}"])
    _run(spark, logdir, ckpt, outdir)
    _write_log(logdir, "b4.txt", [f"99 {BASE + 20060}"])
    _run(spark, logdir, ckpt, outdir)

    got = sorted(
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in spark.read.parquet(outdir).collect()
    )
    want = sorted(
        [
            (1, BASE, BASE + 200, 4),          # cross-batch session
            (1, BASE + 5000, BASE + 5000, 1),  # timer-closed
            (2, BASE, BASE, 1),                # data-revealed on u2's return
            (2, BASE + 4000, BASE + 4000, 1),  # timer-closed
            (3, BASE + 4100, BASE + 4160, 2),  # in-batch backfill gap
            (3, BASE + 7000, BASE + 7000, 1),  # timer-closed
        ]
    )
    assert got == want  # u99's session is still open → not emitted

    # equivalence: the same closed sessions from the BATCH sessionizer
    from hadoop_stuff_spark.operators.temporal import sessionize

    rows = [(u, s) for u, s in [
        (1, BASE), (1, BASE + 60), (1, BASE + 120), (2, BASE),
        (1, BASE + 200), (2, BASE + 4000), (1, BASE + 5000),
        (3, BASE + 4100), (3, BASE + 4160), (3, BASE + 7000),
    ]]
    from datetime import datetime, timezone

    batch = spark.createDataFrame(
        [
            (
                u,
                datetime.fromtimestamp(s, timezone.utc).replace(tzinfo=None),
            )
            for u, s in rows
        ],
        "user_id long, ts timestamp",
    )
    b_sessions = sorted(
        (r.user_id, int(r.start.timestamp()), int(r.end.timestamp()), r.n)
        for r in sessionize(batch)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert b_sessions == want  # batch groups == streamed closed sessions
