"""Missing-data / outage detection over event streams: the largest gaps
between consecutive events, per user and corpus-wide — the "sensor went
dark" report a telemetry pipeline runs before trusting any windowed
aggregate (a 6-hour hole silently deflates every hourly count inside it).

Scale shape: one hash shuffle on user_id + an ordered lag() within each
user partition — no self-join (the naive "events e1 join events e2 on
e2.ts > e1.ts and nothing between" shape is quadratic); gap arithmetic
is exact integer microseconds (no float duration drift between
engines); the global top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table


def event_gap_report(
    spark: SparkSession, sf_dir: str, top: int = 25
) -> DataFrame:
    """Top ``top`` inter-event gaps per the (user_id, ts, event_id)
    order: (user, gap start/end, exact gap in seconds). Ties break on
    (user_id, gap_start event id) so both engines rank identically;
    each user's first event has no predecessor and contributes no gap.
    EVENT_GAP_SQL is the oracle for the DEFAULT ``top=25`` only.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.lag("ts").over(w).alias("gap_start"),
            F.lag("event_id").over(w).alias("start_event_id"),
        )
        .filter(F.col("gap_start").isNotNull())
        # timestampdiff(MICROSECOND, ...): exact long micros, timezone-free
        # (works on the NTZ timestamps the catalog rebuilds; unix_micros
        # does not), mirrored by DuckDB's date_diff('microsecond', ...)
        .select(
            "user_id",
            "start_event_id",
            "gap_start",
            F.col("ts").alias("gap_end"),
            F.round(
                F.expr("timestampdiff(MICROSECOND, gap_start, ts)")
                / F.lit(1000000.0),
                6,
            ).alias("gap_seconds"),
        )
    )
    return gaps.orderBy(
        F.desc("gap_seconds"), F.asc("user_id"), F.asc("start_event_id")
    ).limit(top)


EVENT_GAP_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER w AS gap_start,
         lag(event_id) OVER w AS start_event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, start_event_id, gap_start, ts AS gap_end,
       round(date_diff('microsecond', gap_start, ts) / 1000000.0, 6)
         AS gap_seconds
FROM g WHERE gap_start IS NOT NULL
ORDER BY gap_seconds DESC, user_id, start_event_id
LIMIT 25
"""
