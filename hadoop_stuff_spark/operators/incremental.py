"""Incremental deduplication against a persisted corpus store.

Batch dedup (operators/dedup.py) answers "which docs in THIS corpus are
duplicates of each other"; a production ingest needs the day-2 question:
"which of today's documents are new vs everything already ingested" —
without rescanning the historical corpus text.

Two stores, both plain parquet written once and appended per batch:

- **fingerprint store** (exact dedup): one row per distinct normalized-text
  md5. New batch anti-joins it — one shuffle on a 16-byte key (or a
  broadcast when today's batch is small relative to history: Spark picks).
- **signature store** (near dedup): one row per (band, bucket, doc_id,
  sig) from the MinHash banding, partitioned by ``band`` on disk. Probing
  joins new docs' banded buckets against the store — partition pruning
  keeps the read to the probed bands, the join key is (band, bucket), and
  text never leaves the batch.

Both probes are pure joins: no driver loops, no store rewrite on read;
``update_*`` appends only the NEW batch's rows (history is immutable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.functions.text import fingerprint_md5
from hadoop_stuff_spark.operators.dedup import (
    LSH_BANDS,
    MINHASH_PERMS,
    minhash_signature,
)

# ---------------------------------------------------------------------------
# exact: fingerprint store


def build_fingerprint_store(docs: DataFrame, path: str, text_col: str = "text") -> None:
    docs.select(fingerprint_md5(text_col).alias("fp")).distinct().write.mode(
        "overwrite"
    ).parquet(path)


def novel_against_fingerprints(
    spark: SparkSession, new_docs: DataFrame, path: str, text_col: str = "text"
) -> DataFrame:
    """Rows of ``new_docs`` whose content is NOT in the store (one
    left-anti join on the 16-byte fingerprint). Within-batch duplicates are
    also collapsed to their first (min-id) representative."""
    store = spark.read.parquet(path)
    fp = new_docs.withColumn("fp", fingerprint_md5(text_col))
    novel = fp.join(store, "fp", "left_anti")
    # collapse within-batch dups deterministically (min doc id per fp)
    first = novel.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return novel.join(first, ["fp", "doc_id"]).drop("fp")


def update_fingerprint_store(
    spark: SparkSession, accepted_docs: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Append the accepted batch's (new, distinct) fingerprints."""
    store = spark.read.parquet(path)
    new_fps = (
        accepted_docs.select(fingerprint_md5(text_col).alias("fp"))
        .distinct()
        .join(store, "fp", "left_anti")
    )
    new_fps.write.mode("append").parquet(path)


# ---------------------------------------------------------------------------
# near: banded MinHash signature store


def _banded_sigs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    rows = MINHASH_PERMS // LSH_BANDS
    sigs = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col).alias("sig"),
    )
    return sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * rows + 1, rows),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def build_signature_store(docs: DataFrame, path: str, text_col: str = "text") -> None:
    """Persist the banded MinHash index partitioned by band — probes prune
    to the bands they touch."""
    _banded_sigs(docs, "doc_id", text_col).write.mode("overwrite").partitionBy(
        "band"
    ).parquet(path)


def novel_against_signatures(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    threshold: float = 0.4,
) -> DataFrame:
    """Rows of ``new_docs`` with NO near-duplicate (estimated Jaccard >=
    threshold) in the store. Probe = equi-join on (band, bucket) against
    the partitioned index, then signature-agreement estimation on the
    candidate pairs only."""
    store = spark.read.parquet(path)
    probe = _banded_sigs(new_docs, "doc_id", text_col)
    cand = (
        probe.alias("p")
        .join(
            store.alias("s"),
            (F.col("p.band") == F.col("s.band"))
            & (F.col("p.bucket") == F.col("s.bucket")),
        )
        .select(
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.sig").alias("sig_p"),
            F.col("s.sig").alias("sig_s"),
        )
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_p", "sig_s", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(float(MINHASH_PERMS))
    dup_ids = cand.filter(est >= threshold).select("doc_id").distinct()
    return new_docs.join(dup_ids, "doc_id", "left_anti")


def update_signature_store(
    accepted_docs: DataFrame, path: str, text_col: str = "text"
) -> None:
    _banded_sigs(accepted_docs, "doc_id", text_col).write.mode("append").partitionBy(
        "band"
    ).parquet(path)


# ---------------------------------------------------------------------------
# incremental additive rollups (materialized-aggregate maintenance)


def build_rollup(
    facts: DataFrame,
    path: str,
    keys: list[str],
    sum_cols: dict[str, str],
) -> None:
    """Materialize an additive rollup table: per ``keys`` group, a row
    count and exact integer sums (callers pass pre-scaled long columns,
    e.g. cents — the engine's fixed-point money convention). One scan,
    map-side partials, |groups| rows on disk."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(src).alias(dst) for dst, src in sum_cols.items()
    ]
    facts.groupBy(*keys).agg(*aggs).write.mode("overwrite").parquet(path)


def refresh_rollup(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    keys: list[str],
    sum_cols: dict[str, str],
) -> None:
    """Fold a DELTA of new facts into the materialized rollup WITHOUT
    rescanning history — the day-2 maintenance a 100 TB aggregate table
    needs. Additive aggregates (count/sum) merge exactly: aggregate the
    delta alone (small), union with the |groups|-sized stored table,
    re-sum per key, atomically replace.

    Scale shape: cost is O(|delta| + |groups|), independent of history
    size. Non-additive aggregates (distinct counts) belong in sketch
    tables (operators/sketches.py) — same pattern, mergeable bytes.
    The rewrite is staged to a temp dir then swapped in, so a failed
    refresh never leaves a half-written rollup."""
    import uuid

    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(src).alias(dst) for dst, src in sum_cols.items()
    ]
    delta_agg = delta.groupBy(*keys).agg(*aggs)
    merged = (
        spark.read.parquet(path)
        .unionByName(delta_agg)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(dst).alias(dst) for dst in sum_cols],
        )
    )
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    # swap: point the table at the fresh data (local-fs rename semantics;
    # object stores would use a manifest/metastore pointer instead)
    import shutil

    shutil.rmtree(path)
    shutil.move(staging, path)
