"""Streaming decayed top-k vs the batch decayed top-k (VERDICT r9 #7):
with capacity above the item cardinality the Misra-Gries sketch does no
evictions, so the streaming decayed weights must agree with the
oracle-certified batch operator on the same events — same ranking, same
mass up to the batch op's per-term 6 dp fixed-pointing — and the final
sketch must be invariant to how the stream was split into micro-batches."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadoop_stuff_spark.streaming.stateful import (
    decayed_heavy_hitters,
    exactly_once_parquet_sink,
)
from hadoop_stuff_spark.streaming.tail import tail_stream

BASE = 1_700_000_000  # epoch seconds; whole-second events so the batch
# op's us-resolution and the stream's ms-resolution deltas are the SAME
# exact number of half-lives — no truncation skew between the twins
HALF_LIFE_S = 3600


def _events(spec):
    """spec: list of (sec_offset, event_type) → (sec, type) rows."""
    return [(BASE + s, t) for s, t in spec]


def _write_log(directory, name, events):
    with open(os.path.join(directory, name), "w") as f:
        f.write("\n".join(f"{s} {t}" for s, t in events) + "\n")


def _typed(stream):
    p = F.split(F.col("value"), " ")
    return stream.select(
        F.lit("all").alias("uid"),  # the sketch key schema is STRING
        F.to_timestamp(p[0].cast("long")).alias("ts"),
        p[1].alias("event_type"),
    )


def _run_stream(spark, tmp_path, tag, batches, capacity):
    logdir = str(tmp_path / f"logs_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    outdir = str(tmp_path / f"out_{tag}")
    os.makedirs(logdir)
    for i, batch in enumerate(batches):
        _write_log(logdir, f"b{i}.txt", batch)
        q = (
            decayed_heavy_hitters(
                _typed(tail_stream(spark, logdir)),
                key_col="uid",
                item_col="event_type",
                ts_col="ts",
                half_life_seconds=HALF_LIFE_S,
                capacity=capacity,
            )
            .writeStream.outputMode("update")
            .foreachBatch(exactly_once_parquet_sink(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow run did not finish"
    out = spark.read.parquet(outdir)
    last = out.agg(F.max("batch_id")).collect()[0][0]
    return {
        r["item"]: r["decayed_weight"]
        for r in out.filter(F.col("batch_id") == last).collect()
    }


def _batch_fixture(tmp_path, events, name="sf_topk"):
    """events.parquet for the batch twin: same (sec, type) rows."""
    n = len(events)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [s * 1_000_000 for s, _ in events], pa.timestamp("us")
            ),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array([t for _, t in events]),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)


_SPEC = (
    # old-but-heavy type: 12 hits ~3 half-lives before the end
    [(600 + i, "stale_viral") for i in range(12)]
    # fresh moderate type: 5 hits in the final minutes
    + [(3600 * 3 + 60 * i, "fresh_burst") for i in range(5)]
    # steady background
    + [(900 * i, "steady") for i in range(13)]
)


def test_stream_matches_batch_decayed_topk(spark, tmp_path):
    ev = _events(_SPEC)
    stream_w = _run_stream(spark, tmp_path, "eq", [ev], capacity=16)
    sf = _batch_fixture(tmp_path, ev)
    from hadoop_stuff_spark.operators.temporal import decayed_event_type_topk

    batch = {
        r["event_type"]: (r["n_events"], r["decayed_weight"])
        for r in decayed_event_type_topk(
            spark, sf, half_life_hours=HALF_LIFE_S / 3600.0
        ).collect()
    }
    assert set(stream_w) == set(batch)
    for item, w in stream_w.items():
        n, bw = batch[item]
        # batch fixed-points each decay term at 6 dp before summing;
        # stream sums floats — agreement within n·5e-7 + the output round
        assert math.isclose(w, bw, abs_tol=n * 5e-7 + 1e-6), (item, w, bw)
    # the decayed ranking must agree (fresh beats stale when raw counts say
    # otherwise is the operator's whole point — checked in its own test;
    # here both twins must RANK identically)
    s_rank = sorted(stream_w, key=lambda i: (-stream_w[i], i))
    b_rank = sorted(batch, key=lambda i: (-batch[i][1], i))
    assert s_rank == b_rank


def test_stream_final_sketch_batch_split_invariant(spark, tmp_path):
    """No-eviction regime: the final sketch after (one batch) and after
    (three batches in time order) must be IDENTICAL — the decay anchor
    is data-derived, so the split cannot change any weight."""
    ev = _events(_SPEC)
    one = _run_stream(spark, tmp_path, "one", [ev], capacity=16)
    thirds = [ev[:10], ev[10:20], ev[20:]]
    three = _run_stream(spark, tmp_path, "three", thirds, capacity=16)
    assert set(one) == set(three)
    for item in one:
        assert math.isclose(one[item], three[item], abs_tol=1e-9), item


def test_capacity_squeeze_keeps_heavy_mass(spark, tmp_path):
    """MG guarantee under eviction pressure: any item whose true decayed
    mass exceeds total_mass/capacity must survive a capacity-2 sketch."""
    ev = _events(_SPEC)
    squeezed = _run_stream(spark, tmp_path, "cap2", [ev], capacity=2)
    # true decayed masses (float reference fold)
    t_max = max(s for s, _ in ev)
    true_w = {}
    for s, t in ev:
        true_w[t] = true_w.get(t, 0.0) + 0.5 ** ((t_max - s) / HALF_LIFE_S)
    total = sum(true_w.values())
    for item, w in true_w.items():
        if w > total / 2:
            assert item in squeezed, (item, w, total)
