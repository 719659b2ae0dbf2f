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


def _span_fraction(ranges: list[tuple], lo, hi) -> float:
    """Mean fraction of the key domain each row group's [min,max] covers —
    small means stats are selective on that column."""
    total = hi - lo
    return sum((b - a) / total for a, b in ranges) / len(ranges)


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered layout: row-group stats are selective on BOTH columns;
    a single-column range sort is selective only on its leading column."""
    from hadoop_stuff_spark.sources.layout import write_zordered

    n = 100000
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1000).alias("x"),
        ((F.col("id") * 40503) % 1000).alias("y"),
    )
    zpath = str(tmp_path / "zord")
    spath = str(tmp_path / "xsort")
    write_zordered(df, zpath, ["x", "y"], n_files=32, row_group_mb=1)
    write_range_sorted(df, spath, "x", n_files=32, row_group_mb=1)

    zx = _span_fraction(_row_group_ranges(zpath, "x"), 0, 999)
    zy = _span_fraction(_row_group_ranges(zpath, "y"), 0, 999)
    sx = _span_fraction(_row_group_ranges(spath, "x"), 0, 999)
    sy = _span_fraction(_row_group_ranges(spath, "y"), 0, 999)

    # x-sort: x is near-perfectly clustered, y not at all
    assert sx < 0.2 and sy > 0.8, (sx, sy)
    # z-order: BOTH columns substantially clustered (each row group covers
    # a quadrant-ish of the 2-d domain, not the full axis)
    assert zx < 0.35 and zy < 0.45, (zx, zy)

    # round-trip: no rows lost, values intact
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("x")).collect()[0][0] == df.agg(F.sum("x")).collect()[0][0]


def test_zorder_bounded_clusters_both_columns_without_window(spark, tmp_path):
    """The approxQuantile-bounded key must cluster both columns like the
    window variant, with no global-sort window in its plan."""
    from hadoop_stuff_spark.sources.layout import zorder_key_bounded

    n = 100000
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1000).alias("x"),
        ((F.col("id") * 40503) % 1000).alias("y"),
    )
    key = zorder_key_bounded(df, ["x", "y"], bits=8)
    out = str(tmp_path / "zb")
    (
        df.withColumn("__z", key)
        .repartitionByRange(32, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.option("parquet.block.size", 1024 * 1024)
        .parquet(out)
    )
    zx = _span_fraction(_row_group_ranges(out, "x"), 0, 999)
    zy = _span_fraction(_row_group_ranges(out, "y"), 0, 999)
    assert zx < 0.4 and zy < 0.5, (zx, zy)

    # plan shape: no Window operator anywhere (the scale win vs zorder_key)
    plan = df.withColumn("__z", key)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
