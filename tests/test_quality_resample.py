"""Data-quality gate, resample/gap-fill, and the UDTF surface."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.quality import (
    DQ_ORDERS_SQL,
    check_referential,
    check_rows,
    dq_orders_report,
    enforce,
)
from hadoop_stuff_spark.operators.temporal import (
    RESAMPLE_SQL,
    resample,
    resampled_event_values,
)


def test_dq_report_matches_oracle(spark, sf_dir):
    from tests.oracle_harness import compare_query

    ok, msg = compare_query(spark, sf_dir, dq_orders_report, DQ_ORDERS_SQL)
    assert ok, msg


def test_dq_detects_seeded_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 7.0, "X"), (3, None, "O")],
        "id long, price double, status string",
    )
    rules = {
        "positive_price": F.col("price") > 0,
        "known_status": F.col("status").isin("O", "F", "P"),
    }
    rep = {r.rule: r.n_violations for r in check_rows(df, rules).collect()}
    assert rep == {"positive_price": 2, "known_status": 1}  # NULL price counts

    clean, quarantine = enforce(df, rules)
    assert {r.id for r in clean.collect()} == {1}
    bad = {r.id: sorted(r.failed_rules) for r in quarantine.collect()}
    assert bad[2] == ["positive_price"]
    assert bad[3] == ["known_status"] or bad[3] == ["positive_price"]
    # row (3, None, 'O') fails positive_price via NULL
    assert sorted(x for rs in bad.values() for x in rs).count("positive_price") == 2


def test_fk_orphans_counted(spark):
    child = spark.createDataFrame([(1, 10), (2, 10), (3, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    rep = check_referential(child, "fk", parent, "pk").collect()[0]
    assert rep.n_violations == 1 and rep.n_rows == 3


def test_resample_matches_oracle(spark, sf_dir):
    from tests.oracle_harness import compare_query

    ok, msg = compare_query(spark, sf_dir, resampled_event_values, RESAMPLE_SQL)
    assert ok, msg


def test_resample_zero_fill_densifies_gaps(spark):
    rows = [
        ("a", "2026-01-01 00:10:00", 1.0),
        ("a", "2026-01-01 03:20:00", 2.0),  # hours 1,2 missing
        ("b", "2026-01-01 05:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = resample(
        df, "ts", ["k"], {"n": F.count(F.lit(1)).cast("long")}, fill="zero"
    ).collect()
    a = sorted((r.bucket.hour, r.n) for r in out if r.k == "a")
    assert a == [(0, 1), (1, 0), (2, 0), (3, 1)]
    b = [(r.bucket.hour, r.n) for r in out if r.k == "b"]
    assert b == [(5, 1)]  # key b never pays for key a's span


def test_resample_ffill_carries_last_observation(spark):
    rows = [
        ("a", "2026-01-01 00:00:00", 10.0),
        ("a", "2026-01-01 02:00:00", 30.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = resample(
        df, "ts", ["k"], {"last_v": F.max("v")}, fill="ffill"
    ).collect()
    got = sorted((r.bucket.hour, r.last_v) for r in out)
    assert got == [(0, 10.0), (1, 10.0), (2, 30.0)]  # hour 1 carried forward


def test_udtf_lateral_join_and_malformed_tolerance(spark):
    from hadoop_stuff_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "caller=alice; dur=42;bad-frag"), (2, None)],
        "id long, payload string",
    ).createOrReplaceTempView("cdrs")
    rows = spark.sql(
        "SELECT id, key, value FROM cdrs, LATERAL explode_kv(payload)"
    ).collect()
    got = sorted((r.id, r.key, r.value) for r in rows)
    assert got == [
        (1, "bad-frag", None),
        (1, "caller", "alice"),
        (1, "dur", "42"),
    ]


def test_resample_sub_hour_step(spark):
    rows = [
        ("a", "2026-01-01 00:07:00", 1.0),
        ("a", "2026-01-01 00:40:00", 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = resample(
        df, "ts", ["k"], {"n": F.count(F.lit(1)).cast("long")},
        step="15 minutes", fill="zero",
    ).collect()
    got = sorted((r.bucket.minute, r.n) for r in out)
    assert got == [(0, 1), (15, 0), (30, 1)]
