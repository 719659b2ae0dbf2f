"""Range-sorted layout: row-group stats must be disjoint in the sort key
(the skipping evidence), and a rate-limited stream source (ST5) respects
its rows-per-second bound."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadoop_stuff_spark.sources.layout import write_range_sorted


def _row_group_ranges(path: str, col: str) -> list[tuple]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def _overlaps(ranges: list[tuple]) -> int:
    n = 0
    s = sorted(ranges)
    for (alo, ahi), (blo, bhi) in zip(s, s[1:]):
        if blo <= ahi:  # next range starts inside the previous one
            n += 1
    return n


def test_range_sorted_row_groups_are_disjoint(spark, tmp_path):
    sorted_path = str(tmp_path / "sorted")
    shuffled_path = str(tmp_path / "shuffled")
    # keys scattered across input order (id*2654435761 % N scrambles)
    df = spark.range(200000).select(
        ((F.col("id") * 2654435761) % 200000).alias("k"),
        F.col("id").alias("payload"),
    )
    write_range_sorted(df, sorted_path, "k", n_files=4, row_group_mb=1)
    df.repartition(4).write.parquet(shuffled_path)

    sorted_ranges = _row_group_ranges(sorted_path, "k")
    control_ranges = _row_group_ranges(shuffled_path, "k")
    assert len(sorted_ranges) >= 4
    assert _overlaps(sorted_ranges) == 0, sorted_ranges
    # the unsorted control's row groups nearly all overlap (each spans ~full range)
    assert _overlaps(control_ranges) >= len(control_ranges) - 1

    # rows survive the relayout
    a = spark.read.parquet(sorted_path)
    assert a.count() == 200000 and a.agg(F.sum("payload")).collect()[0][0] == sum(
        range(200000)
    )


def test_rate_source_bounds_intake(spark):
    """ST5 ingest throttling: the rate source emits exactly rows-per-second
    × elapsed, the declarative form of the reference's micro-sleeps
    (IngestTest.java:176-181)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .option("numPartitions", 2)
        .load()
    )
    assert stream.isStreaming and set(stream.columns) == {"timestamp", "value"}
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_probe")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        time.sleep(5)
        n = spark.sql("SELECT count(*) AS n FROM rate_probe").collect()[0]["n"]
    finally:
        q.stop()
    # ~100 rows/s for the observed window; generous bounds for scheduling slop
    assert 0 < n <= 100 * 10, n
