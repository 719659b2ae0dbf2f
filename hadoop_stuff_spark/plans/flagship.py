"""Flagship query (SURVEY.md §7 M0): the reference's two batch jobs fused —
distributed grep (DistributedGrep.java:51-60) + record count
(RecordCount.java:37-78) — over the ``events`` stream table.

Shape: scan → rlike filter → grouped count. Catalyst plans one codegen'd
scan+filter stage, partial HashAggregate, a tiny exchange of (key, n) pairs,
final HashAggregate. The same plan at 100 TB shuffles only one row per
(task × event_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table, spread
from hadoop_stuff_spark.functions.money import sum_2dp_exact

# Records whose JSON props carry a two-digit k (k >= 10) — a regex the way
# the reference's grep queries were regexes over raw record text.
FLAGSHIP_PATTERN = r'"k":\s*[1-9][0-9]'


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(load_table(spark, sf_dir, "events"))
    return (
        events.filter(F.col("props").rlike(FLAGSHIP_PATTERN))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("match_count"),
            sum_2dp_exact("value").alias("total_value"),
        )
    )
