"""Stream-stream interval join with watermarks (SURVEY.md §2.4 "absent"
row — the reference has no joins at all, let alone streaming ones).

Structured Streaming's stream-stream join buffers both sides in the state
store; unbounded buffering is the failure mode at scale. The interval
condition + watermarks on BOTH sides let Spark evict state as the
watermark advances: a row is dropped from state as soon as no future
match can exist for it. State size ≈ input rate × (watermark delay +
interval width) — a constant in stream-time, which is what makes this
runnable forever at 100 TB/day.

Works identically on batch DataFrames (same code path minus watermarks);
the batch twin is the certification oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    interval: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Join right-side rows to left-side rows with the same ``key`` whose
    timestamp falls in [left_ts, left_ts + interval]. Column names must be
    disjoint apart from ``key`` (rename upstream). Both sides get the
    watermark when streaming — required for state eviction AND for Spark
    to accept append-mode output."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    lk, rk = f"__lk_{key}", key
    left = left.withColumnRenamed(key, lk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {interval}"))
    )
    return left.join(right, cond).drop(lk)
