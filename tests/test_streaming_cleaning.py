"""Streaming corpus curation: the batch cleaning/sampling column functions
compose unchanged on a Structured Streaming source (they are pure Catalyst
expressions, so stream==batch by construction — this pins it)."""

import os

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.cleaning import clean_text
from hadoop_stuff_spark.operators.sampling import deterministic_keep
from hadoop_stuff_spark.streaming.tail import tail_stream

LINES = [
    f"user{i} mail bob{i}@example.com said <b>hello</b> call 17325551{i:03d}"
    for i in range(40)
]


def _curate(df):
    return (
        df.select(clean_text("value").alias("text"))
        .filter(deterministic_keep("text", 0.5, salt="s1"))
    )


def test_stream_cleaning_sampling_matches_batch(spark, tmp_path):
    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    with open(os.path.join(logdir, "in.txt"), "w") as f:
        f.write("\n".join(LINES) + "\n")

    q = (
        _curate(tail_stream(spark, logdir))
        .writeStream.format("memory")
        .queryName("curated_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        r["text"] for r in spark.sql("SELECT text FROM curated_stream").collect()
    )
    want = sorted(
        r["text"] for r in _curate(spark.read.text(logdir)).collect()
    )
    assert got == want
    assert 0 < len(got) < len(LINES)  # sample kept a strict, nonempty subset
    assert all("<b>" not in t and "@example.com" not in t for t in got)
