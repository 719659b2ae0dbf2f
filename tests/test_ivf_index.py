"""Persisted IVF index: partition-pruned probes (the 100 TB ANN layout) —
the scan must touch ONLY probed cell directories, and results must match
the in-memory IVF path bit-for-bit (same quantizer, same probes)."""

import glob

from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.similarity import (
    build_ivf_index,
    topk_cosine_ivf,
    topk_cosine_ivf_index,
)

import pytest
# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow


def test_ivf_index_prunes_partitions_and_matches_inmemory(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, sf_dir, idx, n_cells=16)

    cell_dirs = glob.glob(f"{idx}/corpus/cell=*")
    assert len(cell_dirs) > 8  # corpus actually spread over cells

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")

    out = topk_cosine_ivf_index(spark, idx, queries, k=10, n_probe=4)

    # partition pruning is visible in the scan node
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("\n", " "), plan

    got = {(r.query_id, r.rk): r.vec_id for r in out.collect()}
    assert len(got) > 0

    # n_probe=16 == scan everything == must equal in-memory IVF at full probe
    full = topk_cosine_ivf_index(spark, idx, queries, k=10, n_probe=16)
    mem = topk_cosine_ivf(spark, sf_dir, n_queries=5, k=10, n_cells=16, n_probe=16)
    assert {(r.query_id, r.rk, r.vec_id) for r in full.collect()} == {
        (r.query_id, r.rk, r.vec_id) for r in mem.collect()
    }


def test_ivf_append_equals_full_rebuild_query(spark, sf_dir, tmp_path):
    """Index built on half the corpus + appended other half must answer
    queries IDENTICALLY to an index whose corpus was written in one shot
    with the same quantizer (append reuses the saved centroids, so cell
    assignments are the same)."""
    from hadoop_stuff_spark.operators.similarity import append_to_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)

    # full index (quantizer trained on the FULL table via sf_dir)
    full_idx = str(tmp_path / "ivf_full")
    build_ivf_index(spark, sf_dir, full_idx, n_cells=16)

    # incremental: same quantizer (same sf_dir training set), but corpus
    # written as half + append of the other half
    inc_idx = str(tmp_path / "ivf_inc")
    build_ivf_index(spark, sf_dir, inc_idx, n_cells=16)
    # rewrite corpus to only the first half, then append the second
    spark.read.parquet(f"{inc_idx}/corpus").filter(
        F.col("vec_id") % 2 == 0
    ).write.mode("overwrite").partitionBy("cell").parquet(f"{inc_idx}/corpus2")
    import shutil

    shutil.rmtree(f"{inc_idx}/corpus")
    shutil.move(f"{inc_idx}/corpus2", f"{inc_idx}/corpus")
    append_to_ivf_index(spark, inc_idx, second.select("vec_id", "embedding"))

    queries = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")
    a = sorted(
        (r.query_id, r.rk, r.vec_id, r.sim)
        for r in topk_cosine_ivf_index(spark, full_idx, queries, k=10, n_probe=4).collect()
    )
    b = sorted(
        (r.query_id, r.rk, r.vec_id, r.sim)
        for r in topk_cosine_ivf_index(spark, inc_idx, queries, k=10, n_probe=4).collect()
    )
    assert a == b
    # append touched only the cells the batch landed in (corpus still
    # partitioned; vec count = full corpus)
    n = spark.read.parquet(f"{inc_idx}/corpus").count()
    assert n == emb.count()


def test_streaming_ivf_append_sink_converges_and_survives_replay(
    spark, sf_dir, tmp_path
):
    """Streamed vectors land in the index exactly once (upsert-by-key
    convergence), are findable by the partition-pruned query path, and a
    replayed delta is a no-op."""
    import os

    from hadoop_stuff_spark.streaming.vectors import streaming_ivf_append_sink

    idx = str(tmp_path / "ivf")
    work = str(tmp_path / "work")
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")

    # build on the even half, then stream the odd half in two batches
    base.write.parquet(str(tmp_path / "base"))
    build_half = str(tmp_path / "base")
    from hadoop_stuff_spark.operators.similarity import build_ivf_index

    # build_ivf_index loads by sf_dir; build directly from the frame here
    # via the same public path: write the half-corpus as the embeddings
    # table of a scratch dir.
    scratch = tmp_path / "scratch_sf"
    os.makedirs(scratch, exist_ok=True)
    spark.read.parquet(build_half).write.parquet(str(scratch / "embeddings.parquet"))
    build_ivf_index(spark, str(scratch), idx, n_cells=8)

    sink = streaming_ivf_append_sink(idx, work)

    stream_src = str(tmp_path / "incoming")
    os.makedirs(stream_src)
    ckpt = str(tmp_path / "ckpt")
    halves = [new.filter(F.col("vec_id") % 4 == 1), new.filter(F.col("vec_id") % 4 == 3)]
    for i, h in enumerate(halves):
        h.write.parquet(os.path.join(stream_src, f"slice{i}"))
        q = (
            spark.readStream.schema(new.schema)
            .option("maxFilesPerTrigger", "100")
            .parquet(os.path.join(stream_src, "slice*"))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    corpus = spark.read.parquet(f"{idx}/corpus")
    n_total = emb.count()
    assert corpus.count() == n_total
    assert corpus.select("vec_id").distinct().count() == n_total

    # replayed delta (same batch content, direct re-application) is a no-op.
    # Materialize it first: the sink lands its input at this very path, so a
    # lazy self-read would race its own overwrite (a stream batch never
    # reads from the delta dir, so this is a test-only hazard).
    delta_src = spark.read.parquet(os.path.join(work, "deltas", "batch_id=0"))
    first_delta = spark.createDataFrame(delta_src.collect(), delta_src.schema)
    sink(first_delta, 0)
    assert spark.read.parquet(f"{idx}/corpus").count() == n_total

    # streamed vectors are findable through the partition-pruned query path
    queries = new.limit(3)
    out = topk_cosine_ivf_index(spark, idx, queries, k=5, n_probe=8)
    got = {(r.query_id, r.rk): r.vec_id for r in out.collect()}
    assert len(got) == 15  # 3 queries x k=5 over the full 8-probe scan


def test_streaming_ivf_sink_survives_duplicate_and_null_keys(spark, sf_dir, tmp_path):
    """A poison batch (same vec_id twice + a NULL key) must not wedge the
    stream: duplicates collapse to one row, NULL keys drop, the upsert
    succeeds."""
    import os

    from pyspark.sql import Row

    from hadoop_stuff_spark.operators.similarity import build_ivf_index
    from hadoop_stuff_spark.streaming.vectors import streaming_ivf_append_sink

    idx = str(tmp_path / "ivf")
    scratch = tmp_path / "scratch_sf"
    os.makedirs(scratch, exist_ok=True)
    emb = load_table(spark, sf_dir, "embeddings")
    emb.filter(F.col("vec_id") < 100).write.parquet(
        str(scratch / "embeddings.parquet")
    )
    build_ivf_index(spark, str(scratch), idx, n_cells=4)
    base_count = spark.read.parquet(f"{idx}/corpus").count()

    v = emb.filter(F.col("vec_id") == 200).select("embedding").first().embedding
    poison = spark.createDataFrame(
        [Row(vec_id=200, embedding=v), Row(vec_id=200, embedding=v),
         Row(vec_id=None, embedding=v)],
        "vec_id long, embedding array<float>",
    )
    sink = streaming_ivf_append_sink(idx, str(tmp_path / "work"))
    sink(poison, 0)

    corpus = spark.read.parquet(f"{idx}/corpus")
    assert corpus.count() == base_count + 1
    assert corpus.filter(F.col("vec_id") == 200).count() == 1
    assert corpus.filter(F.col("vec_id").isNull()).count() == 0
