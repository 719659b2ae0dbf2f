"""Event-time inactivity watchdog tests: alerts are a pure function of
the data's own timestamps (EventTimeTimeout vs the watermark), so the
planted silences below fire deterministically on replay and restart —
no wall-clock sleeps, unlike the ProcessingTimeTimeout TTL tests."""

import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    exactly_once_parquet_sink,
    inactivity_alerts,
)
from hadoop_stuff_spark.streaming.tail import tail_stream
import pytest

# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow


def _write_log(directory: str, name: str, lines: list[str]) -> None:
    with open(os.path.join(directory, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _timed(stream):
    # line format: "<user> <epoch_seconds>"
    parts = F.split(F.col("value"), " ")
    return stream.select(
        parts[0].alias("user"),
        F.to_timestamp(parts[1].cast("long")).alias("ts"),
    )


BASE = 1_700_000_000  # epoch seconds; all event time is synthetic


def _run(spark, logdir, ckpt, outdir, silence_seconds=3600):
    q = (
        inactivity_alerts(
            _timed(tail_stream(spark, logdir)), "user", "ts", silence_seconds
        )
        .writeStream.foreachBatch(exactly_once_parquet_sink(outdir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_watchdog_alerts_on_event_time_silence(spark, tmp_path):
    """A and B both active at T; only B keeps sending. Once B's events
    push the watermark past A's last_seen + 1h, A's timer fires — with
    A's true last-seen timestamp and event count. B's own 2h10m gap
    (BASE -> BASE+7800) is a real silence too, revealed by the DATA
    path the moment its late event arrives; B's final 100 s gap is
    under the threshold and never alerts."""
    logdir = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    os.makedirs(logdir)

    _write_log(
        logdir,
        "b0.txt",
        [f"A {BASE}", f"A {BASE + 60}", f"B {BASE}"],
    )
    _run(spark, logdir, ckpt, outdir)
    # B advances event time 2h past A's last event; watermark moves on
    # this batch, A's timer fires on the timeout sweep
    _write_log(logdir, "b1.txt", [f"B {BASE + 7800}"])
    _run(spark, logdir, ckpt, outdir)
    # one more nudge so the post-watermark timeout batch definitely ran
    _write_log(logdir, "b2.txt", [f"B {BASE + 7900}"])
    _run(spark, logdir, ckpt, outdir)

    alerts = sorted(
        (r.key, r.last_seen_ms, r.n_events)
        for r in spark.read.parquet(outdir).collect()
    )
    assert alerts == [
        ("A", (BASE + 60) * 1000, 2),  # timer-raised, true last-seen + count
        ("B", BASE * 1000, 1),         # data-revealed on B's own return
    ]


def test_watchdog_rearms_after_alert(spark, tmp_path):
    """After A's alert, A re-appears: state starts fresh (n_events
    resets) and a SECOND silence raises a second alert — one alert per
    silence, not one per key-lifetime."""
    logdir = str(tmp_path / "logs2")
    ckpt = str(tmp_path / "ckpt2")
    outdir = str(tmp_path / "out2")
    os.makedirs(logdir)

    _write_log(logdir, "b0.txt", [f"A {BASE}", f"B {BASE}"])
    _run(spark, logdir, ckpt, outdir)
    _write_log(logdir, "b1.txt", [f"B {BASE + 7200}"])  # 1st silence of A
    _run(spark, logdir, ckpt, outdir)
    _write_log(logdir, "b2.txt", [f"A {BASE + 7300}", f"B {BASE + 7300}"])
    _run(spark, logdir, ckpt, outdir)
    _write_log(logdir, "b3.txt", [f"B {BASE + 14800}"])  # 2nd silence of A
    _run(spark, logdir, ckpt, outdir)
    _write_log(logdir, "b4.txt", [f"B {BASE + 14900}"])
    _run(spark, logdir, ckpt, outdir)

    a_alerts = sorted(
        (r.last_seen_ms, r.n_events)
        for r in spark.read.parquet(outdir).collect()
        if r.key == "A"
    )
    assert a_alerts == [
        (BASE * 1000, 1),           # first silence: 1 event seen
        ((BASE + 7300) * 1000, 1),  # re-armed fresh: count reset to 1
    ]


def test_watchdog_backfill_equals_incremental(spark, tmp_path):
    """Review regression: a silence wholly contained inside ONE
    micro-batch (the backfill case) must raise the same alerts as the
    same events processed incrementally — the data path walks the
    batch's timestamps, the timer only covers the final open silence."""
    lines = [f"A {BASE}", f"B {BASE}", f"A {BASE + 7300}", f"B {BASE + 7300}",
             f"B {BASE + 12000}", f"B {BASE + 12100}"]

    # incremental: one file per run
    inc = {k: str(tmp_path / k) for k in ("logs_i", "ckpt_i", "out_i")}
    os.makedirs(inc["logs_i"])
    for i, line_group in enumerate([lines[:2], lines[2:4], lines[4:5], lines[5:]]):
        _write_log(inc["logs_i"], f"b{i}.txt", line_group)
        _run(spark, inc["logs_i"], inc["ckpt_i"], inc["out_i"])

    # backfill: everything in one availableNow run (+ one nudge so the
    # final timer sweep happens in both scenarios)
    bf = {k: str(tmp_path / k) for k in ("logs_b", "ckpt_b", "out_b")}
    os.makedirs(bf["logs_b"])
    _write_log(bf["logs_b"], "b0.txt", lines[:5])
    _run(spark, bf["logs_b"], bf["ckpt_b"], bf["out_b"])
    _write_log(bf["logs_b"], "b1.txt", lines[5:])
    _run(spark, bf["logs_b"], bf["ckpt_b"], bf["out_b"])

    def alerts(outdir):
        return sorted(
            (r.key, r.last_seen_ms, r.n_events)
            for r in spark.read.parquet(outdir).collect()
        )

    a_inc, a_bf = alerts(inc["out_i"]), alerts(bf["out_b"])
    assert a_inc == a_bf
    # A's first silence (BASE -> BASE+7300 > 1h) must be present in both
    assert ("A", BASE * 1000, 1) in a_bf
