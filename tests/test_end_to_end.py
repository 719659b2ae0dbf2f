"""The reference's whole lifecycle, end-to-end through the engine:
device log → chunked ingest (gradle ingest) → record count + grep
(gradle recordCount/grep) → rolling-log tail + wiretap routing with a
mid-stream subscription (RealTimeCdrWiretap) → exactly-once landed
output. One test = the 'a user of the reference could switch' claim."""

import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.engine import Engine
from hadoop_stuff_spark.functions.fixtures import synth_flow_records
from hadoop_stuff_spark.streaming.stateful import exactly_once_parquet_sink
from hadoop_stuff_spark.streaming.tail import tail_stream


def test_reference_lifecycle_end_to_end(spark, tmp_path):
    eng = Engine(spark)

    # 1. a "device" produced a log file of flow records (+1 hot record)
    src = tmp_path / "device.log"
    n = 20000
    rows = [
        r.value
        for r in spark.range(n).select(synth_flow_records("id").alias("value")).collect()
    ]
    rows[777] = rows[777].replace("156.56.0.", "126.247.0.")  # the hot IP (TailF.java:129)
    src.write_text("\n".join(rows) + "\n")

    # 2. batch: ingest → count → grep (the three gradle tasks)
    store = str(tmp_path / "store")
    eng.ingest(str(src), store, chunk_size=1000)
    assert eng.record_count(store).collect()[0]["record_count"] == n
    hot = eng.grep(store, r"126\.247\.0\.").collect()
    assert len(hot) == 1 and "flow 777" in hot[0]["value"]

    # 3. streaming: tail the log dir, route by subscription, land
    # exactly-once; then a rollover + a NEW subscription mid-stream
    logdir, ckpt = str(tmp_path / "logs"), str(tmp_path / "ckpt")
    out = str(tmp_path / "delivered")
    os.makedirs(logdir)
    with open(os.path.join(logdir, "cdr.0.txt"), "w") as f:
        f.write("\n".join(rows[:100]) + "\n")

    # delivery is executor-side over real sockets (VERDICT r1 #4) — receive
    # with real TCP servers, reference grammar "<regex> <host>:<port>"
    from tests.test_streaming import TcpReceiver

    r1, r2 = TcpReceiver(), TcpReceiver()
    try:
        subs = [f"test7.*watch flow 7$ 127.0.0.1:{r1.port}"]
        q = eng.wiretap(logdir, subs, checkpoint_dir=ckpt, available_now=True)
        q.awaitTermination(300)
        assert r1.received == [rows[7]]

        # rollover (new file) + dynamically registered 2nd subscription:
        # only NEW records are processed (checkpoint), new sub takes effect
        with open(os.path.join(logdir, "cdr.1.txt"), "w") as f:
            f.write("\n".join(rows[100:200]) + "\n")
        r1.received.clear()
        subs.append(f"flow 15[0-9]\\b 127.0.0.1:{r2.port}")
        q2 = eng.wiretap(logdir, subs, checkpoint_dir=ckpt, available_now=True)
        q2.awaitTermination(300)
        assert r1.received == []  # record 7 not re-delivered
        assert sorted(r2.received) == sorted(rows[150:160])
    finally:
        r1.close()
        r2.close()

    # 4. land the tail exactly-once and reconcile counts end-to-end
    q3 = (
        tail_stream(spark, logdir)
        .writeStream.foreachBatch(exactly_once_parquet_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt_land"))
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(300)
    landed = spark.read.parquet(out)
    assert landed.count() == 200
    assert landed.select("value").distinct().count() == 200
