"""Compaction: many small files → few right-sized files, rows preserved."""

import glob
import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.profile import profile_table
from hadoop_stuff_spark.sources.compact import compact, plan_compaction


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    src = str(tmp_path / "sprawl")
    out = str(tmp_path / "compacted")
    # 64 tiny files (the 26-device ingest shape, worse)
    spark.range(100000).withColumn("v", F.col("id") * 2).repartition(64).write.parquet(src)
    n_files, total, _ = plan_compaction(spark, src, target_file_size=total_bytes(src))
    assert n_files == 64

    n_out = compact(spark, src, out, target_file_size=total_bytes(src))
    assert n_out == 1
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 1

    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert b.count() == 100000
    assert a.agg(F.sum("v")).collect()[0][0] == b.agg(F.sum("v")).collect()[0][0]


def total_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )


def test_profile_table_shapes(spark, sf_dir):
    from hadoop_stuff_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    prof = {r["column"]: r for r in profile_table(ev).collect()}
    assert set(prof) == set(ev.columns)
    n = ev.count()
    assert all(r["n_rows"] == n for r in prof.values())
    assert prof["value"]["min_value"] is not None  # numeric col got a range
    assert prof["event_type"]["min_value"] is None  # string col did not
    # HLL estimate within 5% of exact
    exact = ev.select("user_id").distinct().count()
    assert abs(prof["user_id"]["approx_distinct"] - exact) / exact < 0.05