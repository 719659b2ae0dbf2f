"""Streaming categorical-mix PSI: the reference mix freezes on the first
baseline_n labels, stable batches score exactly 0, a planted mix flip —
including a label the reference NEVER saw (the union-cell rule) — crosses
the 0.25 line within one micro-batch, small batches are withheld, and the
emitted PSI equals an independently-computed batch PSI on the same window
(stream ≡ batch), invariant to how the stream splits into micro-batches."""

import math
import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    exactly_once_parquet_sink,
    streaming_category_mix_psi,
)
from hadoop_stuff_spark.streaming.tail import tail_stream


def _write_log(directory, name, labels):
    with open(os.path.join(directory, name), "w") as f:
        f.write("\n".join(f"1 {c}" for c in labels) + "\n")


def _timed(stream):
    p = F.split(F.col("value"), " ")
    return stream.select(
        p[0].cast("long").alias("user_id"),
        p[1].alias("category"),
    )


def _run(spark, logdir, ckpt, outdir, **kw):
    q = (
        streaming_category_mix_psi(_timed(tail_stream(spark, logdir)), **kw)
        .writeStream.foreachBatch(exactly_once_parquet_sink(outdir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _batch_psi(ref_labels, window_labels):
    """Independent plain-Python PSI over the union cell set with the
    house 1e-6 floor — the formula the stream must reproduce."""
    ref = {c: ref_labels.count(c) for c in set(ref_labels)}
    cur = {c: window_labels.count(c) for c in set(window_labels)}
    psi = 0.0
    for c in set(ref) | set(cur):
        pr = max(ref.get(c, 0) / len(ref_labels), 1e-6)
        pc = max(cur.get(c, 0) / len(window_labels), 1e-6)
        psi += (pc - pr) * math.log(pc / pr)
    return psi


MIX = ["URGENT"] * 3 + ["LOW"] * 2  # 3:2 mix, 5 labels per block


def test_catpsi_flags_unseen_label_flip_not_stable_batches(spark, tmp_path):
    """Batch 0 fills the 50-label reference AND scores its 50-label
    remainder (identical mix → psi exactly 0); batch 1 repeats the mix;
    batch 2 flips every label to one the REFERENCE NEVER CONTAINED —
    the union-cell rule must surface all three cells and blow past
    0.25 within that batch; batch 3 is under min_batch_n → withheld."""
    logdir = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    os.makedirs(logdir)

    _write_log(logdir, "b0.txt", MIX * 20)  # 50 fill + 50 window
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)
    _write_log(logdir, "b1.txt", MIX * 10)
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)
    _write_log(logdir, "b2.txt", ["CRITICAL"] * 40)  # unseen label
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)
    _write_log(logdir, "b3.txt", ["URGENT"] * 5)  # below min_batch_n
    _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)

    rows = sorted(
        spark.read.parquet(outdir).collect(), key=lambda r: r["n_batch"]
    )
    assert len(rows) == 3
    assert all(r["n_ref"] == 50 for r in rows)
    stable = [r for r in rows if r["n_batch"] == 50]
    shifted = [r for r in rows if r["n_batch"] == 40]
    assert len(stable) == 2 and len(shifted) == 1
    assert all(r["psi"] == 0.0 and r["drifted"] is False for r in stable)
    assert all(r["n_cells"] == 2 for r in stable)
    # union-cell rule: URGENT + LOW (reference) + CRITICAL (window only)
    assert shifted[0]["n_cells"] == 3
    assert shifted[0]["psi"] > 0.25 and shifted[0]["drifted"] is True
    # stream ≡ batch: the emitted PSI is the plain batch PSI of the window
    expected = _batch_psi(MIX * 10, ["CRITICAL"] * 40)
    assert shifted[0]["psi"] == round(expected, 6)


def test_catpsi_batch_split_invariance(spark, tmp_path):
    """The same in-order label sequence, split fill/window into one
    micro-batch vs two, freezes the identical reference and scores the
    identical PSI for the same window events."""
    drift = ["LOW"] * 30 + ["URGENT"] * 10  # same cells, shifted mix

    def run_split(tag, files):
        logdir = str(tmp_path / f"logs_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        outdir = str(tmp_path / f"out_{tag}")
        os.makedirs(logdir)
        for i, labels in enumerate(files):
            _write_log(logdir, f"b{i}.txt", labels)
            _run(spark, logdir, ckpt, outdir, baseline_n=50, min_batch_n=20)
        return {
            (r["n_batch"], r["psi"], r["n_cells"], r["drifted"])
            for r in spark.read.parquet(outdir).collect()
        }

    one = run_split("one", [MIX * 10 + drift])  # fill + window, one batch
    two = run_split("two", [MIX * 10, drift])  # fill, then window
    assert one == two
    ((_, psi, _, drifted),) = one
    assert psi == round(_batch_psi(MIX * 10, drift), 6)
    assert drifted is (psi > 0.25)
