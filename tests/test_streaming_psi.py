"""Streaming PSI drift detector: the reference freezes on the first
baseline_n values, stable batches score ~0, a planted distribution shift
crosses the 0.25 line within one micro-batch, and small batches are
withheld rather than scored on noise."""

import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    exactly_once_parquet_sink,
    streaming_psi_drift,
)
from hadoop_stuff_spark.streaming.tail import tail_stream

EDGES = (2.0, 4.0, 6.0, 8.0)  # 5 bins over [0, 10)


def _write_log(directory, name, values):
    with open(os.path.join(directory, name), "w") as f:
        f.write("\n".join(f"1 {v}" for v in values) + "\n")


def _timed(stream):
    p = F.split(F.col("value"), " ")
    return stream.select(
        p[0].cast("long").alias("user_id"),
        p[1].cast("double").alias("value"),
    )


def _run(spark, logdir, ckpt, outdir, **kw):
    q = (
        streaming_psi_drift(_timed(tail_stream(spark, logdir)), EDGES, **kw)
        .writeStream.foreachBatch(exactly_once_parquet_sink(outdir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_streaming_psi_flags_planted_shift_not_stable_batches(spark, tmp_path):
    """Batch 0 fills the 50-value reference AND scores its 50-value
    remainder (same mix → psi ~0); batch 1 repeats the mix (~0); batch 2
    shifts all mass to the top bin → psi far past 0.25, flagged within
    that one batch; batch 3 is under min_batch_n and emits nothing."""
    logdir = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    os.makedirs(logdir)
    mix = [1.0, 3.0, 5.0, 7.0, 9.0] * 10  # uniform over the 5 bins

    _write_log(logdir, "b0.txt", mix + mix)
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)
    _write_log(logdir, "b1.txt", mix)
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)
    _write_log(logdir, "b2.txt", [9.5] * 40)  # everything lands in bin 4
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)
    _write_log(logdir, "b3.txt", [1.0] * 5)  # below min_batch_n
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)

    rows = sorted(
        spark.read.parquet(outdir).collect(), key=lambda r: r["n_batch"]
    )
    # three emissions: b0 remainder (50), b1 (50), b2 (40); b3 withheld
    assert len(rows) == 3
    assert all(r["n_ref"] == 50 for r in rows)
    stable = [r for r in rows if r["n_batch"] == 50]
    shifted = [r for r in rows if r["n_batch"] == 40]
    assert len(stable) == 2 and len(shifted) == 1
    assert all(r["psi"] == 0.0 for r in stable)  # identical mix, exact bins
    assert all(r["drifted"] is False for r in stable)
    assert shifted[0]["psi"] > 0.25
    assert shifted[0]["drifted"] is True


def test_streaming_psi_rejects_unsorted_edges(spark):
    import pytest

    from hadoop_stuff_spark.streaming.stateful import streaming_psi_drift

    df = spark.range(1).selectExpr("id AS user_id", "1.0 AS value")
    with pytest.raises(ValueError):
        streaming_psi_drift(df, (3.0, 1.0))
    with pytest.raises(ValueError):
        streaming_psi_drift(df, ())
