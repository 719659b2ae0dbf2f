"""Partition retention: metadata-only expiry, dry-run default, retained
rows untouched byte-for-byte."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.sources.retention import expire_partitions, list_partitions


def test_expire_partitions_dry_run_then_real(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2026-01-01", i) for i in range(10)]
        + [("2026-01-02", i) for i in range(10)]
        + [("2026-01-03", i) for i in range(10)],
        "day string, v long",
    )
    df.write.partitionBy("day").parquet(table)
    assert [v for v, _ in list_partitions(table, "day")] == [
        "2026-01-01", "2026-01-02", "2026-01-03",
    ]

    # dry run: reports, deletes nothing
    would = expire_partitions(table, "day", keep_from="2026-01-03")
    assert would == ["2026-01-01", "2026-01-02"]
    assert spark.read.parquet(table).count() == 30

    # real: drops exactly those; retained rows identical
    before = sorted(
        (r.day, r.v)
        for r in spark.read.parquet(table).filter(F.col("day") == "2026-01-03").collect()
    )
    dropped = expire_partitions(table, "day", keep_from="2026-01-03", dry_run=False)
    assert dropped == ["2026-01-01", "2026-01-02"]
    after = spark.read.parquet(table)
    assert after.count() == 10
    assert sorted((r.day, r.v) for r in after.collect()) == before

    # idempotent re-run
    assert expire_partitions(table, "day", keep_from="2026-01-03", dry_run=False) == []
