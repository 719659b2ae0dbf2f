"""Spark 4 Python DataSource tests: greplog batch pushdown semantics and
the tailf streaming source's in-place-append pickup (the capability the
stock file source lacks — reference TailF.java:110-149)."""

import os
import time

import pyspark.sql.functions as F
import pytest

from hadoop_stuff_spark.sources import pyds
from hadoop_stuff_spark.sources.pyds import _GrepLogReader, _last_complete_offset


@pytest.fixture()
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds.register(spark)
    return spark


def _poll_count(spark, outdir, want, timeout=90):
    deadline = time.time() + timeout
    n = -1
    while time.time() < deadline:
        try:
            n = spark.read.parquet(outdir).count()
        except Exception:
            n = -1
        if n >= want:
            return n
        time.sleep(0.5)
    return n


def test_greplog_pushdown_equals_plain_filter(registered, tmp_path):
    spark = registered
    d = str(tmp_path / "logs")
    os.makedirs(d)
    lines = [f"line {i} {'needle' if i % 7 == 0 else 'hay'}" for i in range(200)]
    for part in range(2):
        with open(f"{d}/p{part}.log", "w") as f:
            f.write("\n".join(lines[part * 100 : (part + 1) * 100]) + "\n")

    via_source = (
        spark.read.format("greplog")
        .option("path", d)
        .load()
        .filter(F.col("value").contains("needle"))
    )
    expected = sorted(l for l in lines if "needle" in l)
    assert sorted(r.value for r in via_source.collect()) == expected
    # a filter the source does NOT support still applies (handed back)
    mixed = (
        spark.read.format("greplog")
        .option("path", d)
        .load()
        .filter(F.col("value").contains("needle"))
        .filter(F.col("value").endswith("needle"))
    )
    assert sorted(r.value for r in mixed.collect()) == expected


def test_greplog_reader_retains_only_supported_filters():
    from pyspark.sql.datasource import EqualTo, IsNotNull, StringContains

    r = _GrepLogReader({"path": "/nonexistent"})
    unsupported = list(
        r.pushFilters(
            [
                StringContains(("value",), "x"),
                IsNotNull(("value",)),
                StringContains(("source_file",), "y"),
            ]
        )
    )
    assert r._contains == ["x"]
    assert r._file_contains == ["y"]  # file pruning filter consumed
    # IsNotNull is handed back to Spark
    assert len(unsupported) == 1


def test_last_complete_offset_caps_at_newline(tmp_path):
    p = str(tmp_path / "f.log")
    with open(p, "w") as f:
        f.write("complete line\nhalf writ")
    off = _last_complete_offset(p)
    assert off == len("complete line\n")
    with open(p, "a") as f:
        f.write("ten\n")
    assert _last_complete_offset(p) == os.path.getsize(p)
    # never regresses below a committed floor
    assert _last_complete_offset(p, lo=10**9) == 10**9


def test_tailf_picks_up_in_place_appends_and_restarts(registered, tmp_path):
    spark = registered
    logd = str(tmp_path / "tail_logs")
    outd = str(tmp_path / "tail_out")
    ck = str(tmp_path / "tail_ck")
    os.makedirs(logd)
    with open(f"{logd}/t.log", "w") as f:
        f.write("l1\nl2\n")

    def start():
        return (
            spark.readStream.format("tailf")
            .option("path", logd)
            .load()
            .writeStream.format("parquet")
            .option("path", outd)
            .option("checkpointLocation", ck)
            .trigger(processingTime="500 milliseconds")
            .start()
        )

    q = start()
    try:
        assert _poll_count(spark, outd, 2) == 2
        # append IN PLACE — the stock file source would never see these
        with open(f"{logd}/t.log", "a") as f:
            f.write("l3\nl4\nl5 half")  # last line incomplete: must be held back
        assert _poll_count(spark, outd, 4) == 4
        got = sorted(r.value for r in spark.read.parquet(outd).collect())
        assert got == ["l1", "l2", "l3", "l4"]
    finally:
        q.stop()

    # finish the half line, restart from checkpoint: only new bytes emit
    with open(f"{logd}/t.log", "a") as f:
        f.write("done\nl6\n")
    q = start()
    try:
        assert _poll_count(spark, outd, 6) == 6
        got = sorted(r.value for r in spark.read.parquet(outd).collect())
        assert got == ["l1", "l2", "l3", "l4", "l5 halfdone", "l6"]
    finally:
        q.stop()


def test_greplog_source_file_filter_prunes_files(registered, tmp_path):
    """A source_file filter prunes at PLANNING time: only matching files
    become partitions (never opened otherwise), and results equal the
    post-scan filter semantics."""
    spark = registered
    d = str(tmp_path / "logs2")
    os.makedirs(d)
    with open(f"{d}/app.log", "w") as f:
        f.write("app line 1\napp line 2\n")
    with open(f"{d}/sys.log", "w") as f:
        f.write("sys line 1\n")

    df = (
        spark.read.format("greplog")
        .option("path", d)
        .load()
        .filter(F.col("source_file").contains("app."))
    )
    rows = df.collect()
    assert sorted(r.value for r in rows) == ["app line 1", "app line 2"]

    # reader-level check: the planner only sees the matching file
    r = _GrepLogReader({"path": d})
    from pyspark.sql.datasource import StringContains

    list(r.pushFilters([StringContains(("source_file",), "app.")]))
    parts = r.partitions()
    assert [os.path.basename(p.path) for p in parts] == ["app.log"]
