"""Queries over the reference's record formats (T9 CDR synthesis +
flow-log parsing — SURVEY.md §1.2, T8/T9) and the runtime-supplied
expression surface (U2/U3).

The testdata has no flow_logs/cdr table, so these queries *synthesize* the
reference-format lines deterministically from ``events`` (the fixture
generator role of IngestTest.java:105 / HdfsReadWriteSample.java:112-113),
then parse them back with the engine's parsers. The oracle computes the
expected parsed fields directly from ``events`` — certifying the full
format→parse round trip.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.functions.money import sum_2dp_exact, sum_2dp_exact_sql
from hadoop_stuff_spark.functions.records import (
    format_flow_log,
    parse_cdr,
    parse_flow_log,
)


def _flow_lines(ev: DataFrame) -> DataFrame:
    """Deterministic flow-log lines derived from events rows."""
    line = format_flow_log(
        pri=(F.col("event_id") % 8 + 16).cast("int"),
        ts=F.col("ts"),
        set_name=F.concat(F.lit("CGN-SET"), (F.col("user_id") % 4).cast("string")),
        user=F.upper("event_type"),
        event=F.lit("ASP_SFW_DELETE_FLOW"),
        proto=(F.col("event_id") % 16 + 1).cast("int"),
        proto_name=F.lit("TELNET"),
        application=F.concat(F.lit("app"), (F.col("user_id") % 10).cast("string")),
        interface=F.lit("ge-12/0/0.0"),
        src_ip=F.concat(
            F.lit("156.56."), (F.col("event_id") % 200).cast("string"), F.lit(".124")
        ),
        src_port=(F.col("event_id") % 40000 + 1024).cast("int"),
        dst_ip=F.lit("156.56.0.125"),
        dst_port=(F.col("event_id") % 40000 + 1025).cast("int"),
        message=F.lit("deleting forward or watch flow 2"),
        nat_ip=F.lit("156.56.0.126"),
        nat_port=(F.col("event_id") % 40000 + 1026).cast("int"),
    )
    return ev.select(F.col("event_id"), line.alias("raw"))


def t9_flow_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render reference-format flow lines, parse them back with the engine
    parser, return the parsed fields. Oracle computes the same fields
    straight from events — any format/parse disagreement breaks the hash."""
    ev = load_table(spark, sf_dir, "events")
    lines = _flow_lines(ev)
    parsed = lines.select("event_id", *parse_flow_log("raw", keep_raw=False))
    return parsed.select(
        "event_id", "pri", "ts", "set_name", "user", "proto", "src_ip", "src_port"
    )


FLOW_ROUNDTRIP_SQL = """
SELECT event_id,
       CAST(event_id % 8 + 16 AS INTEGER) AS pri,
       date_trunc('second', ts) AS ts,
       concat('CGN-SET', CAST(user_id % 4 AS VARCHAR)) AS set_name,
       upper(event_type) AS "user",
       CAST(event_id % 16 + 1 AS INTEGER) AS proto,
       concat('156.56.', CAST(event_id % 200 AS VARCHAR), '.124') AS src_ip,
       CAST(event_id % 40000 + 1024 AS INTEGER) AS src_port
FROM events
"""


def _cdr_lines(ev: DataFrame) -> DataFrame:
    """Deterministic ~34-field CDR lines (phone/timestamps/ips + int tail
    with legal empty fields) from events rows."""
    start = F.date_format(F.col("ts"), "yyyyMMddHHmmss")
    end = F.date_format(F.col("ts") + F.expr("INTERVAL 3 SECONDS"), "yyyyMMddHHmmss")
    tail = []
    for j in range(25):
        # every 5th tail field empty — the reference's ',,' pattern
        if j % 5 == 4:
            tail.append(F.lit(""))
        else:
            tail.append(((F.col("event_id") + j) % 9).cast("string"))
    line = F.concat_ws(
        ",",
        F.lit("1"),
        F.concat(F.lit("1732555"), F.lpad((F.col("user_id") % 10000).cast("string"), 4, "0")),
        (F.col("event_id") % 32).cast("string"),
        start,
        end,
        F.concat(start, F.lit("30")),
        (F.col("event_id") % 16 + 1).cast("string"),
        F.lit("208.226.140.57"),
        F.lit("192.168.10.64"),
        *tail,
    )
    return ev.select("event_id", line.alias("raw"))


def t9_cdr_parse_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize CDRs, parse (split-once, typed fields, empty→null),
    aggregate per code — certifies from_csv-style extraction including
    null tail fields."""
    ev = load_table(spark, sf_dir, "events")
    parsed = _cdr_lines(ev).select("event_id", *parse_cdr("raw"))
    return parsed.groupBy("code").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("phone").alias("n_phones"),
        F.min("start_ts").alias("first_start"),
        F.sum("leg_count").alias("total_legs"),
        F.sum(F.when(F.col("f14").isNull(), 1).otherwise(0)).alias("null_f14"),
    )


CDR_PARSE_SQL = """
SELECT CAST(event_id % 32 AS INTEGER) AS code,
       count(*) AS n,
       count(DISTINCT concat('1732555', lpad(CAST(user_id % 10000 AS VARCHAR), 4, '0'))) AS n_phones,
       min(date_trunc('second', ts)) AS first_start,
       CAST(sum(event_id % 16 + 1) AS BIGINT) AS total_legs,
       CAST(count(*) AS BIGINT) AS null_f14
FROM events
GROUP BY 1
"""


def u2_grouped_custom_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 (custom UDAF surface): per-group median + IQR via applyInPandas —
    the reference's Reducer analog (RecordCount.java:66-79) as an
    Arrow-batched grouped pandas function. Shuffle carries the grouped
    rows; at 100 TB prefer built-in percentile_approx unless exact
    order-statistics are required."""
    ev = load_table(spark, sf_dir, "events")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "median_value": [round(float(v.median()), 4)],
                "iqr": [round(float(v.quantile(0.75) - v.quantile(0.25)), 4)],
            }
        )

    return ev.select("event_type", "value").groupBy("event_type").applyInPandas(
        stats, "event_type string, median_value double, iqr double"
    )


U2_SQL = """
SELECT event_type,
       round(median(value), 4) AS median_value,
       round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 4) AS iqr
FROM events GROUP BY event_type
"""


def u3_expression_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 (runtime-supplied scalar predicate — the SpEL analog,
    RealTimeCdrWiretap.java:68): a query arriving as a SQL expression
    STRING, compiled by Catalyst at plan time."""
    ev = load_table(spark, sf_dir, "events")
    predicate = "event_type rlike 'error|signup' and value > 50.0"
    return ev.filter(F.expr(predicate)).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), sum_2dp_exact("value").alias("total")
    )


U3_SQL = f"""
SELECT event_type, count(*) AS n, {sum_2dp_exact_sql('value', 'total')}
FROM events
WHERE regexp_matches(event_type, 'error|signup') AND value > 50.0
GROUP BY event_type
"""
