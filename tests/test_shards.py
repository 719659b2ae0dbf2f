"""Deterministic sharding / reproducible corpus shuffle behavior:
partitioning-invariance, balance, on-disk layout, order stability. The
DuckDB-differential certification queries (n3_shard_balance,
n3_corpus_shuffle) live in EXTRA_QUERIES."""

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.shards import (
    shard_key,
    shuffle_corpus,
    write_training_shards,
)


def _ids(spark, n=400):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_shard_key_partitioning_invariant(spark):
    df = _ids(spark)
    a = df.select("doc_id", shard_key("doc_id", 8).alias("s")).collect()
    b = (
        df.repartition(13)
        .select("doc_id", shard_key("doc_id", 8).alias("s"))
        .collect()
    )
    assert {r["doc_id"]: r["s"] for r in a} == {r["doc_id"]: r["s"] for r in b}


def test_shard_balance_uniform_ish(spark):
    counts = (
        _ids(spark, 800)
        .select(shard_key("doc_id", 8).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    by_shard = {r["s"]: r["count"] for r in counts}
    assert set(by_shard) == set(range(8))
    assert max(by_shard.values()) < 2.5 * min(by_shard.values())


def test_write_training_shards_layout_roundtrip(spark):
    tmp = tempfile.mkdtemp(prefix="shards_")
    try:
        df = _ids(spark, 300).withColumn("text", F.lit("x"))
        write_training_shards(df, f"{tmp}/out", "doc_id", n_shards=4)
        back = spark.read.parquet(f"{tmp}/out")
        assert back.count() == 300
        assert back.select("shard").distinct().count() == 4
        # shard subsetting is reproducible: same doc_ids on re-read
        s0 = sorted(
            r["doc_id"] for r in back.filter("shard = 0").select("doc_id").collect()
        )
        expected = sorted(
            r["doc_id"]
            for r in df.select("doc_id", shard_key("doc_id", 4).alias("s"))
            .filter("s = 0")
            .collect()
        )
        assert s0 == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_shuffle_corpus_deterministic_and_not_identity(spark):
    df = _ids(spark, 500)
    run1 = [r["doc_id"] for r in shuffle_corpus(df, "doc_id").collect()]
    run2 = [
        r["doc_id"] for r in shuffle_corpus(df.repartition(7), "doc_id").collect()
    ]
    assert run1 == run2  # reproducible across runs and partitionings
    assert sorted(run1) == list(range(500))  # a permutation
    assert run1 != list(range(500))  # and actually shuffled
