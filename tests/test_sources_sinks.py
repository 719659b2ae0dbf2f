"""Source/sink parity tests (SURVEY.md S1-S5, S8, A5, P10-P12):
- legacy SequenceFile round trip through the RDD bridge (S3/S4)
- text scan/sink (S1/S2), noop sink (S5)
- partitioned chunked store with partition pruning (P12)
- observe() running counter (A5)
"""

import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.counts import observed_count
from hadoop_stuff_spark.sources.chunks import (
    chunk_lines_partitionwise,
    explode_chunks,
    read_chunked,
    write_chunked,
)
from hadoop_stuff_spark.sources.sequencefile import (
    read_sequencefile_chunks,
    write_sequencefile_chunks,
)


def test_sequencefile_roundtrip(spark, tmp_path):
    """S3/S4: chunks written as SequenceFile[LongWritable, BytesWritable]
    come back bit-identical and decode to the original records."""
    lines = spark.createDataFrame(
        [(f"record {i}",) for i in range(1000)], "line: string"
    ).repartition(4)
    chunks = chunk_lines_partitionwise(lines, "line", 100)
    path = str(tmp_path / "legacy.seq")
    write_sequencefile_chunks(chunks, path)
    back = read_sequencefile_chunks(spark, path)
    assert back.schema.simpleString() == "struct<key:bigint,value:binary>"
    records = explode_chunks(back, "line")
    assert records.count() == 1000
    assert set(r.line for r in records.collect()) == {f"record {i}" for i in range(1000)}


def test_text_scan_and_sink(spark, tmp_path):
    """S1/S2: line-oriented text source/sink."""
    out = str(tmp_path / "txt")
    df = spark.createDataFrame([(f"line {i}",) for i in range(100)], "value: string")
    df.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    assert back.count() == 100
    assert back.columns == ["value"]


def test_noop_sink(spark):
    """S5: side-effect-only job (NullOutputFormat analog)."""
    spark.range(1000).write.format("noop").mode("overwrite").save()


def test_partitioned_chunk_store_prunes(spark, tmp_path):
    """P12: date/host-style partitioned layout → Catalyst partition
    pruning visible in the physical plan."""
    df = spark.createDataFrame(
        [(f"rec {i}", f"2012-06-{13 + i % 2:02d}", f"host{i % 3}") for i in range(600)],
        "line: string, dt: string, host: string",
    )
    path = str(tmp_path / "chunked")
    # partition columns must survive chunking: chunk per (dt, host) group
    chunks = (
        df.repartition("dt", "host")
        .groupBy("dt", "host")
        .agg(F.concat_ws("\n", F.collect_list("line")).alias("text"))
    )
    from hadoop_stuff_spark.functions.codecs import gzip_compress

    chunks.select(
        "dt", "host", F.lit(0).cast("long").alias("key"), gzip_compress("text").alias("value")
    ).write.partitionBy("dt", "host").mode("overwrite").parquet(path)

    scan = spark.read.parquet(path).filter(
        (F.col("dt") == "2012-06-13") & (F.col("host") == "host1")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    recs = scan.select(F.explode(F.split(F.col("value").cast("string"), "\n"))).count()
    # explicit gzip decode path:
    recs2 = explode_chunks(scan.select("key", "value"), "line").count()
    assert recs2 == 100  # 600 rows / (2 dates × 3 hosts)


def test_write_read_chunked_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(f"r{i}",) for i in range(500)], "line: string")
    path = str(tmp_path / "store")
    write_chunked(df, "line", path, chunk_size=64)
    back = read_chunked(spark, path, "line")
    assert back.count() == 500


def test_observe_metric(spark):
    """A5: running counter via observe — one pass, no extra job."""
    from pyspark.sql import Observation

    obs = Observation("ingest")
    df = spark.range(5000).observe(obs, F.count(F.lit(1)).alias("records"))
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["records"] == 5000
