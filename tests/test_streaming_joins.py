"""Stream-stream interval join: streaming result == batch join on the same
data (the batch twin is the oracle), and watermark-expired rows never
match."""

import os
from datetime import datetime

from hadoop_stuff_spark.streaming.joins import interval_join


def _ts(minute: int) -> datetime:
    return datetime(2026, 1, 1, 12, minute, 0)


CLICKS = [  # (user, l_ts)
    (1, _ts(0)),
    (1, _ts(30)),
    (2, _ts(5)),
    (3, _ts(10)),
]
PURCHASES = [  # (user, r_ts, amount)
    (1, _ts(4), 10.0),   # joins click@0 (within 10 min)
    (1, _ts(33), 20.0),  # joins click@30
    (2, _ts(25), 30.0),  # too late for click@5 → no match
    (4, _ts(6), 40.0),   # no click at all
]


def _dfs(spark, clicks_dir=None, purchases_dir=None):
    clicks = spark.createDataFrame(CLICKS, "user_id long, l_ts timestamp")
    purchases = spark.createDataFrame(
        PURCHASES, "user_id long, r_ts timestamp, amount double"
    )
    if clicks_dir:
        clicks.write.parquet(clicks_dir)
        purchases.write.parquet(purchases_dir)
    return clicks, purchases


def test_interval_join_batch_semantics(spark):
    clicks, purchases = _dfs(spark)
    got = {
        (r.user_id, r.l_ts.minute, r.r_ts.minute, r.amount)
        for r in interval_join(clicks, purchases, "user_id").collect()
    }
    assert got == {(1, 0, 4, 10.0), (1, 30, 33, 20.0)}


def test_interval_join_stream_equals_batch(spark, tmp_path):
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    outdir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    clicks, purchases = _dfs(spark, cdir, pdir)

    s_clicks = spark.readStream.schema(clicks.schema).parquet(cdir)
    s_purch = spark.readStream.schema(purchases.schema).parquet(pdir)
    q = (
        interval_join(s_clicks, s_purch, "user_id")
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch = {
        (r.user_id, r.l_ts, r.r_ts, r.amount)
        for r in interval_join(clicks, purchases, "user_id").collect()
    }
    stream = {
        (r.user_id, r.l_ts, r.r_ts, r.amount)
        for r in spark.read.parquet(outdir).collect()
    }
    assert stream == batch and len(stream) == 2
