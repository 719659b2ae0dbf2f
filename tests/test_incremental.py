"""Incremental dedup against persisted stores (operators/incremental.py):
two-batch ingest scenarios for the exact fingerprint store and the banded
MinHash signature store."""

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.incremental import (
    build_fingerprint_store,
    build_signature_store,
    novel_against_fingerprints,
    novel_against_signatures,
    update_fingerprint_store,
    update_signature_store,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_fingerprint_store_two_batch_ingest(spark, tmp_path):
    path = str(tmp_path / "fps")
    day1 = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "eta theta iota")],
    )
    build_fingerprint_store(day1, path)

    day2 = _docs(
        spark,
        [
            (10, "alpha beta gamma"),        # exact dup of day1 doc 1
            (11, "ALPHA  beta   gamma"),     # normalized dup (case/space)
            (12, "totally new content one"),
            (13, "totally new content one"), # within-batch dup of 12
            (14, "totally new content two"),
        ],
    )
    novel = novel_against_fingerprints(spark, day2, path)
    assert sorted(r.doc_id for r in novel.collect()) == [12, 14]

    update_fingerprint_store(spark, novel, path)
    # day3 re-sends day2 content: nothing is novel anymore
    day3 = _docs(spark, [(20, "totally new content one"), (21, "alpha beta gamma")])
    assert novel_against_fingerprints(spark, day3, path).count() == 0
    # store holds exactly the 5 distinct contents, no dup fps from appends
    store = spark.read.parquet(path)
    assert store.count() == store.distinct().count() == 5


def test_signature_store_two_batch_near_dups(spark, tmp_path):
    path = str(tmp_path / "sigs")
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    day1 = _docs(spark, [(1, base), (2, "completely different words here " * 3)])
    build_signature_store(day1, path)

    # near-dup of doc 1: one word changed out of 14 (high Jaccard overlap)
    near = base.replace("lazy", "sleepy")
    day2 = _docs(
        spark,
        [
            (10, near),
            (11, "brand new unrelated document about spark shuffles and joins"),
        ],
    )
    novel = novel_against_signatures(spark, day2, path, threshold=0.4)
    assert sorted(r.doc_id for r in novel.collect()) == [11]

    update_signature_store(novel, path)
    # re-sending the accepted doc now dedups against the updated store
    day3 = _docs(
        spark,
        [(20, "brand new unrelated document about spark shuffles and joins")],
    )
    assert novel_against_signatures(spark, day3, path).count() == 0


def test_signature_store_probe_prunes_bands(spark, tmp_path):
    """The on-disk index is partitioned by band; a probe restricted to one
    band reads only that partition (PartitionFilters in the scan)."""
    path = str(tmp_path / "sigs")
    day1 = _docs(spark, [(1, "some words to index for the partition test case")])
    build_signature_store(day1, path)
    scan = spark.read.parquet(path).filter(F.col("band") == 3)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band" in plan
    assert scan.count() == 1  # one (band=3, bucket) row per doc


def test_streaming_ingest_dedup_pipeline(spark, tmp_path):
    """The streaming twin of the store-based flow: tail → fingerprint →
    stateful first-seen dedup → exactly-once landing. Re-sent content in
    later files never lands twice, across micro-batch runs (checkpointed
    state)."""
    import os

    from hadoop_stuff_spark.functions.text import fingerprint_md5
    from hadoop_stuff_spark.streaming.stateful import (
        dedup_first_seen,
        exactly_once_parquet_sink,
    )
    from hadoop_stuff_spark.streaming.tail import tail_stream

    logdir = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "landed")
    os.makedirs(logdir)

    def run():
        stream = tail_stream(spark, logdir).select(
            fingerprint_md5("value").alias("key"), F.col("value")
        )
        q = (
            dedup_first_seen(stream, "key", "value")
            .writeStream.foreachBatch(exactly_once_parquet_sink(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    with open(os.path.join(logdir, "a.txt"), "w") as f:
        f.write("rec one\nrec two\nrec one\nREC  ONE\n")  # normalized dups
    run()
    landed = spark.read.parquet(out)
    assert sorted(r.value for r in landed.select("value").collect()) == [
        "rec one",
        "rec two",
    ]

    # second run: a new file re-sends old content + one new record
    with open(os.path.join(logdir, "b.txt"), "w") as f:
        f.write("rec two\nrec three\nrec one\n")
    run()
    landed = spark.read.parquet(out)
    vals = sorted(r.value for r in landed.select("value").collect())
    assert vals == ["rec one", "rec three", "rec two"]  # each content once, ever


def test_incremental_rollup_refresh_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Folding a delta into the materialized rollup must equal rebuilding
    from scratch over (history + delta) — exactly, not approximately."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.incremental import build_rollup, read_rollup, refresh_rollup

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "price_cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    hist = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta = orders.filter(F.col("o_orderkey") % 5 == 0)
    path = str(tmp_path / "rollup")
    keys = ["o_orderpriority", "o_orderstatus"]
    sums = {"total_cents": "price_cents"}

    build_rollup(hist, path, keys, sums)
    refresh_rollup(spark, delta, path, keys, sums)
    got = {
        (r.o_orderpriority, r.o_orderstatus): (r.n_rows, r.total_cents)
        for r in read_rollup(spark, path).collect()
    }
    full = {
        (r.o_orderpriority, r.o_orderstatus): (r.n_rows, r.total_cents)
        for r in orders.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").alias("total_cents"),
        )
        .collect()
    }
    assert got == full

    # refresh with an empty delta is a no-op
    refresh_rollup(spark, delta.limit(0), path, keys, sums)
    again = {
        (r.o_orderpriority, r.o_orderstatus): (r.n_rows, r.total_cents)
        for r in read_rollup(spark, path).collect()
    }
    assert again == full


def test_rollup_swap_is_atomic_on_crash(spark, tmp_path):
    """A fold that dies mid-write (before the pointer replace) must leave
    the previous data AND folded manifest fully intact — the crash
    window ADVICE r3 flagged: data-swap and marker must commit together."""
    import pytest

    from hadoop_stuff_spark.operators.incremental import (
        _swap_in,
        build_rollup,
        folded_batches,
        read_rollup,
    )

    path = str(tmp_path / "rollup")
    facts = spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)], "k string, v long")
    build_rollup(facts, path, ["k"], {"total": "v"}, folded=["0"])
    before = {r.k: (r.n_rows, r.total) for r in read_rollup(spark, path).collect()}

    def dying_write(vdir):
        import os

        os.makedirs(vdir)
        with open(os.path.join(vdir, "partial.parquet"), "w") as f:
            f.write("garbage")
        raise RuntimeError("simulated executor/driver crash mid-write")

    with pytest.raises(RuntimeError):
        _swap_in(path, dying_write, ["0", "1"])

    # pointer untouched: same data, same folded set — replay will re-fold
    assert folded_batches(path) == {"0"}
    after = {r.k: (r.n_rows, r.total) for r in read_rollup(spark, path).collect()}
    assert after == before


def test_rollup_swap_retains_previous_version_one_generation(spark, tmp_path):
    """The immediately-previous version survives one swap (in-flight
    readers finish), and is GC'd after the next one."""
    import os

    from hadoop_stuff_spark.operators.incremental import (
        build_rollup,
        refresh_rollup,
    )

    path = str(tmp_path / "r")
    facts = spark.createDataFrame([("a", 1)], "k string, v long")
    delta = spark.createDataFrame([("b", 2)], "k string, v long")

    def versions():
        return sorted(e for e in os.listdir(path) if e.startswith("v_"))

    build_rollup(facts, path, ["k"], {"t": "v"})
    v1 = versions()
    assert len(v1) == 1
    refresh_rollup(spark, delta, path, ["k"], {"t": "v"})
    v2 = versions()
    assert len(v2) == 2 and v1[0] in v2  # previous retained
    refresh_rollup(spark, delta, path, ["k"], {"t": "v"})
    v3 = versions()
    assert len(v3) == 2 and v1[0] not in v3  # twice-superseded GC'd


def test_read_rollup_previous_version_time_travel(spark, tmp_path):
    """version='previous' reads the one retained prior snapshot; before
    any refresh there is none; after two refreshes the oldest is gone."""
    import pytest

    from hadoop_stuff_spark.operators.incremental import (
        build_rollup,
        read_rollup,
        refresh_rollup,
    )

    path = str(tmp_path / "tt")
    build_rollup(
        spark.createDataFrame([("a", 1)], "k string, v long"), path, ["k"], {"t": "v"}
    )
    with pytest.raises(ValueError, match="no previous version"):
        read_rollup(spark, path, version="previous")

    refresh_rollup(
        spark,
        spark.createDataFrame([("b", 5)], "k string, v long"),
        path,
        ["k"],
        {"t": "v"},
    )
    prev = {r.k: r.t for r in read_rollup(spark, path, version="previous").collect()}
    cur = {r.k: r.t for r in read_rollup(spark, path).collect()}
    assert prev == {"a": 1}
    assert cur == {"a": 1, "b": 5}
