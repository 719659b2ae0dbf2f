"""Mergeable HLL sketch tables — distinct-count rollups that never
rescan the fact table.

THE pattern for distinct counts at 100 TB: you cannot afford to re-scan
a year of events to answer "distinct users last quarter", and exact
distinct-count partials do not merge (a user active on two days would be
double-counted by summing daily exacts). HyperLogLog sketches DO merge:
build one small (<= ~1.5 KB at lgK=12) sketch per (day, event_type) cell
ONCE, persist them as a tiny sketch table, then answer any coarser
rollup — per day, per type, global, arbitrary date ranges — by unioning
sketch bytes. Spark 4 ships Apache DataSketches HLL natively
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), JVM-side
and whole-stage-codegen friendly, so the fast path has zero Python.

Scale shape: the one fact scan does a partial `hll_sketch_agg` map-side
(each task emits one sketch per local cell — bytes, not user_ids — so
the shuffle carries |cells| x ~KB regardless of row count). Every
downstream rollup reads the sketch table: |cells| rows, seconds at any
scale, and the estimates are IDENTICAL to sketching the raw facts
directly (union of per-cell sketches == one big sketch, certified by
test).

Estimates are deterministic for fixed input (DataSketches is
seed-stable), but do not match DuckDB's approx_distinct algorithm —
so the registry entry is rows-only; pytest certifies <2% relative error
vs exact at sf0.01 and the union==direct identity.

Reference provenance: the reference has only exact streaming counters
(IngestTest.java:90-94 prints running totals); it has no distinct-count
story at all. This is the beyond-reference §2.7 scale analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table

LG_K = 12  # 4096 buckets, ~1.6% standard error


def build_user_sketches(events: DataFrame, lg_k: int = LG_K) -> DataFrame:
    """One HLL sketch of distinct user_ids per (event_date, event_type)
    cell. This is the expensive pass — one fact scan, partial sketches
    map-side — whose output (a few KB per cell) is what you persist."""
    return (
        events.select(
            F.to_date("ts").alias("event_date"),
            "event_type",
            "user_id",
        )
        .groupBy("event_date", "event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("user_sketch"))
    )


def rollup_distinct_users(sketches: DataFrame) -> DataFrame:
    """Distinct users per event_type across ALL days — a sketch-table
    union, no fact scan. Merging is `hll_union_agg` over the binary
    column; the result estimates the TRUE cross-day distinct (users
    active on many days count once)."""
    return (
        sketches.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("user_sketch", F.lit(True))
            ).alias("approx_distinct_users")
        )
        .orderBy("event_type")
    )


def distinct_users_between(
    sketches: DataFrame, start: str, end: str
) -> DataFrame:
    """Global distinct users in [start, end) — arbitrary date-range
    rollup from the same sketch table (the query that would otherwise
    rescan the range's raw events)."""
    return (
        sketches.filter(
            (F.col("event_date") >= F.lit(start)) & (F.col("event_date") < F.lit(end))
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("user_sketch", F.lit(True))
            ).alias("approx_distinct_users")
        )
    )


def sketch_distinct_users_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Certification query: build the daily sketch table, roll it up per
    event_type. Rows-only oracle (HLL != DuckDB's approx algorithm);
    pytest pins <2% error vs exact and the union==direct identity."""
    events = load_table(spark, sf_dir, "events")
    return rollup_distinct_users(build_user_sketches(events))
