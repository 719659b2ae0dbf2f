"""Event-time window + watermark tests (streaming/windows.py): the
streaming result must equal the batch result on the same data, and a
watermark must drop too-late rows deterministically in append mode."""

import os
import time

from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.windows import windowed_event_counts

EVENT_SCHEMA = "ts timestamp, user_id long, event_type string, value double"


def _write_events(directory: str, name: str, rows: list[tuple[str, int, str, float]]) -> None:
    lines = [
        f'{{"ts": "{ts}", "user_id": {uid}, "event_type": "{et}", "value": {v}}}'
        for ts, uid, et, v in rows
    ]
    with open(os.path.join(directory, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_windowed_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    rows = [
        ("2024-01-01 10:00:00", 1, "view", 1.0),
        ("2024-01-01 10:04:00", 2, "view", 2.0),
        ("2024-01-01 10:11:00", 1, "buy", 5.0),
        ("2024-01-01 10:59:00", 3, "view", 1.5),
        ("2024-01-01 11:01:00", 3, "buy", 7.25),
    ]
    _write_events(src, "a.json", rows)

    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        windowed_event_counts(stream, window="10 minutes", watermark="5 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_event_counts(batch, window="10 minutes").collect()
    }
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.table("win_stream").collect()
    }
    assert got == want
    assert len(want) == 4  # 10:00 view×2 / 10:10 buy / 10:50 view / 11:00 buy


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Watermark semantics (empirically pinned): a late row merges into its
    window only while that window's state is live; once the watermark has
    evicted the window, later arrivals are DROPPED (numRowsDroppedByWatermark).

    Timeline (watermark delay 10 min, 10 min tumbling windows):
    - batch 0: 10:00, 10:05, 11:00  → watermark advances to 10:50
    - batch 1: 12:00               → [10:00,10:10) evicted+emitted (n=2);
                                      watermark advances to 11:50
    - batch 2: 10:02 (too late — window already closed) + 12:30
    """
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_events(
        src,
        "batch1.json",
        [
            ("2024-01-01 10:00:00", 1, "view", 1.0),
            ("2024-01-01 10:05:00", 2, "view", 1.0),
            ("2024-01-01 11:00:00", 3, "view", 1.0),
        ],
    )
    time.sleep(1.1)  # distinct mtimes → file source preserves batch order
    _write_events(src, "batch2.json", [("2024-01-01 12:00:00", 5, "view", 1.0)])
    time.sleep(1.1)
    _write_events(
        src,
        "batch3.json",
        [
            ("2024-01-01 10:02:00", 4, "view", 99.0),  # too late — dropped
            ("2024-01-01 12:30:00", 6, "view", 1.0),
        ],
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        windowed_event_counts(stream, window="10 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("win_append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1

    emitted = {
        r.window_start.strftime("%H:%M"): (r.n, r.total_value)
        for r in spark.table("win_append").collect()
    }
    # [10:00, 10:10) finalized with exactly its 2 on-time rows; the late
    # 99.0-value row appears nowhere
    assert emitted.get("10:00") == (2, 2.0), emitted
    assert all(v[1] != 99.0 and v[1] != 101.0 for v in emitted.values())


def test_trending_terms_stream_matches_batch(spark, tmp_path):
    from hadoop_stuff_spark.streaming.windows import trending_terms

    src = str(tmp_path / "docs")
    os.makedirs(src)
    doc_rows = [
        ("2024-01-01 10:00:00", "spark spark shuffle"),
        ("2024-01-01 10:03:00", "spark join"),
        ("2024-01-01 10:12:00", "shuffle shuffle shuffle"),
        ("2024-01-01 10:14:00", "spark"),
    ]
    lines = [f'{{"ts": "{ts}", "text": "{t}"}}' for ts, t in doc_rows]
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join(lines) + "\n")
    schema = "ts timestamp, text string"

    stream = spark.readStream.schema(schema).json(src)
    q = (
        trending_terms(stream, window="10 minutes", watermark="5 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("trend_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch = spark.read.schema(schema).json(src)
    want = {
        (r.window_start, r.word): r.n
        for r in trending_terms(batch, window="10 minutes").collect()
    }
    got = {
        (r.window_start, r.word): r.n
        for r in spark.table("trend_stream").collect()
    }
    assert got == want
    # the 10:00 window counts: spark 3, shuffle 1, join 1
    from datetime import datetime

    w0 = datetime(2024, 1, 1, 10, 0)
    assert got[(w0, "spark")] == 3 and got[(w0, "shuffle")] == 1
