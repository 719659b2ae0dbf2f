"""Idempotent partition backfill (sources/backfill.py): replacing one
partition must leave every sibling byte-identical, and the guard must
reject mis-filtered backfill frames."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from hadoop_stuff_spark.sources.backfill import (
    backfill_partition,
    overwrite_partitions,
)


def _day_df(spark, day: str, values: list[int]):
    return spark.createDataFrame(
        [(day, v) for v in values], "day: string, value: long"
    )


def _read_day(spark, path: str, day: str) -> list[int]:
    return sorted(
        r["value"]
        for r in spark.read.parquet(path).filter(F.col("day") == day).collect()
    )


def test_backfill_replaces_only_target_partition(spark, tmp_path):
    path = str(tmp_path / "table")
    base = _day_df(spark, "2024-01-01", [1, 2, 3]).union(
        _day_df(spark, "2024-01-02", [10, 20])
    )
    overwrite_partitions(base, path, ["day"])
    day1_files = sorted(glob.glob(os.path.join(path, "day=2024-01-01", "*.parquet")))
    day1_stats = [(f, os.path.getsize(f)) for f in day1_files]

    # corrected day-2 data lands; day-1 directory must be untouched
    backfill_partition(
        _day_df(spark, "2024-01-02", [11, 21, 31]),
        path,
        ["day"],
        {"day": "2024-01-02"},
    )
    assert _read_day(spark, path, "2024-01-02") == [11, 21, 31]
    assert _read_day(spark, path, "2024-01-01") == [1, 2, 3]
    after = [(f, os.path.getsize(f)) for f in
             sorted(glob.glob(os.path.join(path, "day=2024-01-01", "*.parquet")))]
    assert after == day1_stats  # same files, same bytes — never rewritten


def test_backfill_guard_rejects_misfiltered_frame(spark, tmp_path):
    path = str(tmp_path / "table")
    overwrite_partitions(_day_df(spark, "2024-01-01", [1]), path, ["day"])
    two_days = _day_df(spark, "2024-01-01", [9]).union(
        _day_df(spark, "2024-01-02", [9])
    )
    with pytest.raises(ValueError, match="backfill frame"):
        backfill_partition(two_days, path, ["day"], {"day": "2024-01-02"})
    # table unchanged
    assert _read_day(spark, path, "2024-01-01") == [1]


def test_overwrite_mode_conf_is_restored(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, None)
    overwrite_partitions(
        _day_df(spark, "2024-01-01", [1]), str(tmp_path / "t"), ["day"]
    )
    assert spark.conf.get(key, None) == before
