"""Event-time windowed aggregation with watermarks (SURVEY.md §2.4 "absent"
row — the reference is arrival-order only, TailF.java:132; no event-time
semantics exist anywhere in it). This module supplies the standard
Structured Streaming window surface the reference lacked:

- tumbling / sliding windows over an event-time column,
- watermarks for bounded state + deterministic late-data drop,
- session windows (gap-based) via ``F.session_window``.

Scale notes: windowed aggregation shuffles on (window, key) — partial
aggregation is map-side as always; the watermark bounds the state store
size (without it, state grows with the number of open windows forever).
At 100 TB/day stream rates the watermark delay IS the memory knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_stuff_spark.functions.money import sum_2dp_exact


def windowed_event_counts(
    events: DataFrame,
    window: str = "6 hours",
    slide: str | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window counts + value sums
    per key. Works identically on a streaming or a batch DataFrame — the
    batch form is the oracle (see WINDOWED_COUNTS_SQL); the streaming form
    adds the watermark so append-mode emission and late-drop are defined."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide)
        if slide
        else F.window(ts_col, window)
    )
    return (
        events.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_2dp_exact("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n",
            "total_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: events for a key closer than ``gap`` apart merge
    into one session. State is per (key, open session) and bounded by the
    watermark."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )
