"""HLL sketch table: error bound vs exact, and the merge identity that
makes sketch tables safe to roll up (union of per-cell sketches gives
the same estimate as sketching the raw column directly)."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.sketches import (
    build_user_sketches,
    distinct_users_between,
    rollup_distinct_users,
    sketch_distinct_users_by_type,
)


def test_sketch_rollup_error_bound(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r.event_type: r.approx_distinct_users
        for r in sketch_distinct_users_by_type(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.02, (t, est[t], n)


def test_sketch_union_equals_direct_sketch(spark, sf_dir):
    """The mergeability contract: rolling up daily sketches must give the
    SAME estimate as one sketch over the raw facts — otherwise persisted
    sketch tables would drift from truth."""
    events = load_table(spark, sf_dir, "events")
    via_table = {
        r.event_type: r.approx_distinct_users
        for r in rollup_distinct_users(build_user_sketches(events)).collect()
    }
    direct = {
        r.event_type: r.est
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert via_table == direct


def test_sketch_range_rollup_and_persistence(spark, sf_dir, tmp_path):
    """Sketch table survives a parquet round-trip (binary column) and
    answers date-range queries without the fact table."""
    events = load_table(spark, sf_dir, "events")
    table = build_user_sketches(events)
    path = str(tmp_path / "user_sketches")
    table.write.parquet(path)
    reloaded = spark.read.parquet(path)

    lo, hi = (
        events.agg(
            F.date_format(F.min(F.to_date("ts")), "yyyy-MM-dd").alias("lo"),
            F.date_format(F.date_add(F.max(F.to_date("ts")), 1), "yyyy-MM-dd").alias("hi"),
        ).collect()[0]
    )
    est = distinct_users_between(reloaded, lo, hi).collect()[0].approx_distinct_users
    exact = events.agg(F.countDistinct("user_id").alias("n")).collect()[0].n
    assert abs(est - exact) / exact < 0.02
