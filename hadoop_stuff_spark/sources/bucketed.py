"""Bucketed table layout — the shuffle-free fact-fact join path
(SURVEY.md §4 'custom Spark work' / SCALE.md §3).

The reference co-locates nothing; every MR job re-reads and re-shuffles.
At 100 TB the dominant repeated cost of the relational surface is the
lineitem⋈orders shuffle. Bucketing both tables on the join key at WRITE
time (`df.write.bucketBy(n, key).sortBy(key)`) makes every later equi-join
and groupBy on that key shuffle-free: Spark's scan reports the hash
partitioning, Catalyst drops the Exchange on both sides.

Sizing: n_buckets ≈ table_size / target_partition_size (128–512 MiB).
Both join sides must use the SAME bucket count (or a multiple, with
`spark.sql.bucketing.coalesceBucketsInJoin.enabled`).

These write through the session catalog (`saveAsTable`) because bucket
metadata lives in the table catalog, not the parquet files — path-based
reads can't see it. That is the production pattern too (metastore-backed
tables on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.
    Sorting within buckets additionally removes the Sort below a
    sort-merge join (plan becomes scan→join directly)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_pair: tuple[str, str]
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket keys.
    With matching bucketing this plans with ZERO Exchange operators —
    verified by plan inspection in tests/test_bucketed.py."""
    lk, rk = key_pair
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[lk] == right[rk])
