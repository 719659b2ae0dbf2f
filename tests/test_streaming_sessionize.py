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
    case a timer can never see); u4's event arrives a batch LATE behind
    cross-key skew (u2 already pushed event time past it — survivable
    only because the default watermark delay is one session gap, ADVICE
    r8); the final open sessions close via the watermark timer once u99
    pushes event time forward. The closed-session set must equal the
    batch sessionizer's groups."""
    logdir = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    os.makedirs(logdir)

    # event time stays monotone ACROSS batches except u4's planted skew
    # below (the default watermark delay of one gap absorbs exactly that
    # much cross-key lag; anything older is legitimately late data)
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
            # u4 arrives one batch late: b1's max event time (BASE+4000)
            # already passed BASE+3000 — with a zero watermark delay this
            # row would be dropped as late; the one-gap default keeps it
            f"4 {BASE + 3000}",
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
            (4, BASE + 3000, BASE + 3000, 1),  # cross-key-skew straggler
        ]
    )
    assert got == want  # u99's session is still open → not emitted

    # equivalence: the same closed sessions from the BATCH sessionizer
    from hadoop_stuff_spark.operators.temporal import sessionize

    rows = [(u, s) for u, s in [
        (1, BASE), (1, BASE + 60), (1, BASE + 120), (2, BASE),
        (1, BASE + 200), (2, BASE + 4000), (1, BASE + 5000),
        (3, BASE + 4100), (3, BASE + 4160), (3, BASE + 7000),
        (4, BASE + 3000),
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


def test_decayed_heavy_hitters_fresh_overtakes_stale(spark, tmp_path):
    """Item A: 8 hits long ago; item B: 3 hits now (half-life 1 h, Δt =
    3 h → A's mass decays to 1.0). The decayed ranking must put B first
    while the undecayed count ranking would keep A; the decayed weights
    themselves are exact powers of two of the event-time deltas."""
    from hadoop_stuff_spark.streaming.stateful import (
        decayed_heavy_hitters,
        exactly_once_parquet_sink,
    )
    from hadoop_stuff_spark.streaming.tail import tail_stream

    logdir = str(tmp_path / "dhh_logs")
    ckpt = str(tmp_path / "dhh_ckpt")
    outdir = str(tmp_path / "dhh_out")
    os.makedirs(logdir)

    def run():
        parts_fn = F.split(F.col("value"), " ")
        timed = tail_stream(spark, logdir).select(
            parts_fn[0].alias("k"),
            parts_fn[1].alias("it"),
            F.to_timestamp(parts_fn[2].cast("long")).alias("ts"),
        )
        q = (
            decayed_heavy_hitters(
                timed, "k", "it", "ts", half_life_seconds=3600, capacity=4
            )
            .writeStream.outputMode("update")
            .foreachBatch(exactly_once_parquet_sink(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _write_log(logdir, "b0.txt", [f"u A {BASE}" for _ in range(8)])
    run()
    _write_log(
        logdir, "b1.txt", [f"u B {BASE + 3 * 3600}" for _ in range(3)]
    )
    run()

    import pyspark.sql.functions as _F

    last = (
        spark.read.parquet(outdir)
        .withColumn(
            "bid",
            _F.regexp_extract(_F.input_file_name(), r"batch_id=(\d+)", 1).cast(
                "int"
            ),
        )
    )
    max_bid = last.agg(_F.max("bid")).collect()[0][0]
    rows = {
        r["item"]: r["decayed_weight"]
        for r in last.filter(_F.col("bid") == max_bid).collect()
    }
    # A: 8 · 0.5^3 = 1.0 after three half-lives; B: 3 · 0.5^0 = 3.0
    assert rows["A"] == 1.0
    assert rows["B"] == 3.0
    # and the first batch recorded A undecayed
    first = {
        r["item"]: r["decayed_weight"]
        for r in last.filter(_F.col("bid") == 0).collect()
    }
    assert first["A"] == 8.0


def test_decayed_mg_merge_mass_guarantee_property():
    """The Misra-Gries guarantee transfers from counts to decayed MASS:
    for random weighted batches folded at capacity c, (1) any item whose
    total mass exceeds total/c is tracked, (2) every estimate
    undercounts its true mass by at most total/c (+ float slack), and
    (3) estimates never overcount."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoop_stuff_spark.streaming.stateful import _decayed_mg_merge

    batch_st = st.lists(
        st.tuples(
            st.sampled_from([f"i{k}" for k in range(12)]),
            st.floats(min_value=0.01, max_value=8.0, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(batch_st, min_size=1, max_size=6), st.integers(3, 8))
    def run(batches, cap):
        truth: dict[str, float] = {}
        sketch: dict[str, float] = {}
        for batch in batches:
            w: dict[str, float] = {}
            for item, x in batch:
                w[item] = w.get(item, 0.0) + x
                truth[item] = truth.get(item, 0.0) + x
            sketch = _decayed_mg_merge(sketch, w, cap)
        assert len(sketch) <= cap
        total = sum(truth.values())
        slack = total / cap + 1e-6
        for item, true_mass in truth.items():
            est = sketch.get(item, 0.0)
            assert est <= true_mass + 1e-6  # never overcount
            assert est >= true_mass - slack  # bounded undercount
            if true_mass > total / cap + 1e-6:
                assert item in sketch  # heavy mass always survives

    run()
