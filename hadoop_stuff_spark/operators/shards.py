"""Deterministic corpus sharding + reproducible global shuffle — the
"write the training set" tail of an LLM data pipeline.

Scale design:
- shard assignment is a pure map-side md5 expression (no RNG state, no
  shuffle): the same row lands in the same shard on any cluster, any
  partitioning, any run — the property training-data reproducibility
  needs. The md5-prefix trick is the same one `operators/sampling.py`
  uses for deterministic sampling.
- `write_training_shards` materializes shard dirs via partitionBy(shard):
  one shuffle on the shard key, then parallel writes; shards are
  uniform by construction (md5 prefix is uniform), so no shard becomes
  a straggler file at 100 TB.
- `shuffle_corpus` gives a reproducible global *order* without a global
  sort bottleneck: repartitionByRange on the shuffle key (range exchange,
  sampled boundaries) + sortWithinPartitions — the standard scalable
  total-order recipe; no single-partition window anywhere.

Reference provenance: the reference's nearest analog is the chunked
store layout (ChunkRecorder.java:30-61 — fixed-size chunk packing);
sharding generalizes it to key-deterministic output splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table, spread

_HEX = "0123456789abcdef"


def _hex_val(h: Column) -> Column:
    """Integer value of the first two hex chars of a digest (0..255),
    via locate() arithmetic — portable to the oracle (DuckDB strpos)."""
    return (
        (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1)
    )


def shard_key(key: Column | str, n_shards: int, salt: str = "shard1") -> Column:
    """Deterministic shard id in [0, n_shards) from md5(salt:key): uniform,
    RNG-free, partitioning-invariant. n_shards <= 256 (two hex chars)."""
    if not 1 <= n_shards <= 256:
        raise ValueError("n_shards must be in [1, 256]")
    key_col = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt + ":"), key_col.cast("string")))
    return (_hex_val(h) % n_shards).cast("int")


def shuffle_key(key: Column | str, salt: str = "shuf1") -> Column:
    """Reproducible pseudo-random ordering key: md5(salt:key) hex string.
    Sorting by it is a deterministic global shuffle of the corpus."""
    key_col = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt + ":"), key_col.cast("string")))


def shuffle_corpus(df: DataFrame, id_col: str, salt: str = "shuf1") -> DataFrame:
    """Reproducibly shuffle a corpus: range-partition + in-partition sort on
    the md5 shuffle key. Total order across output files without a global
    single-partition sort; same order on every run and cluster size."""
    keyed = df.withColumn("_shuf", shuffle_key(id_col, salt))
    return (
        keyed.repartitionByRange("_shuf")
        .sortWithinPartitions("_shuf")
        .drop("_shuf")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 8,
    salt: str = "shard1",
) -> None:
    """Materialize the corpus as n_shards deterministic parquet shard
    directories (shard=K/). Readers get per-shard parallelism and can
    subset reproducibly (e.g. shard < 2 is always the same 25%)."""
    out = df.withColumn("shard", shard_key(id_col, n_shards, salt))
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-shard document counts for an 8-way deterministic
    shard split — certifies both the assignment function and its balance."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(shard_key("doc_id", 8).alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SHARD_BALANCE_SQL = """
WITH h AS (
  SELECT md5('shard1:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents
), v AS (
  SELECT ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) % 8 AS shard
  FROM h
)
SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_docs
FROM v GROUP BY 1
"""


def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the reproducible-shuffle ordering key per document
    plus its global position. The position uses a window ONLY for
    certification at test scale; the production path (shuffle_corpus)
    range-partitions instead and never materializes global positions."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    keyed = docs.select("doc_id", shuffle_key("doc_id").alias("shuffle_key"))
    w = Window.orderBy("shuffle_key", "doc_id")
    return keyed.withColumn("position", F.row_number().over(w).cast("long"))


CORPUS_SHUFFLE_SQL = """
SELECT doc_id, md5('shuf1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST(row_number() OVER (ORDER BY md5('shuf1:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
         AS position
FROM documents
"""
