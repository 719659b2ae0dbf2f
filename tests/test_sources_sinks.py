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


def test_write_chunked_partition_cols_end_to_end(spark, tmp_path):
    """VERDICT r1 #3: write_chunked(partition_cols=...) is the reference's
    date/host layout (IngestTest.java:58,68). Partition columns must survive
    the chunker, produce a partitionBy'd store, prune on read, and chunks
    must never mix rows from different partition values."""
    df = spark.createDataFrame(
        [
            (f"rec {i}", f"2012-06-{13 + i % 2:02d}", f"host{i % 3}")
            for i in range(600)
        ],
        "line: string, dt: string, host: string",
    ).repartition(4)
    path = str(tmp_path / "chunked_pc")
    write_chunked(df, "line", path, chunk_size=10, partition_cols=["dt", "host"])

    # hive-style directory layout exists
    assert any(d.startswith("dt=") for d in os.listdir(path))

    # pruned read: only the selected (dt, host) partition is scanned
    scan = spark.read.parquet(path).filter(
        (F.col("dt") == "2012-06-13") & (F.col("host") == "host1")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    recs = explode_chunks(scan.select("key", "value"), "line")
    got = {r.line for r in recs.collect()}
    want = {f"rec {i}" for i in range(600) if i % 2 == 0 and i % 3 == 1}
    assert got == want  # 100 records, exactly the partition's rows

    # full store round-trips every record exactly once
    assert read_chunked(spark, path, "line").count() == 600

    # no chunk mixes partition values: every chunk in every leaf directory
    # decodes to records of that directory's (dt, host) only
    all_chunks = spark.read.parquet(path)
    mixed = (
        explode_chunks(all_chunks.select("key", "value", "dt", "host"), "line")
        .withColumn("i", F.regexp_extract("line", r"rec (\d+)", 1).cast("int"))
        .filter(
            (F.col("dt") != F.concat(F.lit("2012-06-"), F.lpad((F.lit(13) + F.col("i") % 2).cast("string"), 2, "0")))
            | (F.col("host") != F.concat(F.lit("host"), (F.col("i") % 3).cast("string")))
        )
        .count()
    )
    assert mixed == 0


def test_observe_metric(spark):
    """A5: running counter via observe — one pass, no extra job."""
    from pyspark.sql import Observation

    obs = Observation("ingest")
    df = spark.range(5000).observe(obs, F.count(F.lit(1)).alias("records"))
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["records"] == 5000


def test_explode_chunks_rebalances_pathological_skew(spark):
    """SURVEY §7 skew case (r3 VERDICT #7): ONE huge chunk among many tiny
    ones. Without rebalance every line of the big chunk stays in the
    decoding task's partition — a straggler that dominates any CPU-heavy
    downstream stage. With rebalance=True the exploded lines spread
    evenly: no partition holds more than a small multiple of the mean,
    and the pipeline completes with the exact line count."""
    import gzip

    import pyspark.sql.functions as F

    from hadoop_stuff_spark.sources.chunks import explode_chunks

    def chunk(lines):
        return gzip.compress("\n".join(lines).encode("utf-8"), 6, mtime=0)

    big = chunk([f"big {i} xxxxxxxxxxxxxxxxxxxxxxxx" for i in range(100_000)])
    rows = [(0, bytearray(big))] + [
        (k, bytearray(chunk([f"small {k} {i}" for i in range(10)])))
        for k in range(1, 101)
    ]
    chunks = spark.createDataFrame(rows, "key long, value binary")
    n_expected = 100_000 + 100 * 10

    # skewed baseline: the big chunk's lines all land in one partition
    skewed = explode_chunks(chunks, "line")
    skew_counts = [
        r.n
        for r in skewed.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(skew_counts) >= 100_000  # the straggler exists

    balanced = explode_chunks(chunks, "line", rebalance=True)
    counts = [
        r.n
        for r in balanced.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert sum(counts) == n_expected
    mean = n_expected / len(counts)
    assert max(counts) <= 2 * mean, (max(counts), mean, len(counts))
    # and the rebalanced plan actually carries the round-robin exchange
    plan = balanced._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan


def test_orc_format_grep_and_count(spark, tmp_path):
    """ORC as a first-class batch format (Spark-native columnar sibling
    of parquet): grep and count read it through the same engine calls."""
    from hadoop_stuff_spark.engine import Engine

    path = str(tmp_path / "orc_store")
    spark.createDataFrame(
        [("CALL alpha",), ("FLOW beta",), ("CALL gamma",)], "value string"
    ).write.orc(path)

    eng = Engine(spark)
    assert eng.record_count(path, fmt="orc").collect()[0]["record_count"] == 3
    got = sorted(r.value for r in eng.grep(path, "^CALL", fmt="orc").collect())
    assert got == ["CALL alpha", "CALL gamma"]
    assert (
        eng.grep_count(path, "^CALL", fmt="orc").collect()[0]["match_count"] == 2
    )
