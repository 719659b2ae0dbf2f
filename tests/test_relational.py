"""Relational-surface property tests beyond the oracle harness."""

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.relational import (
    approx_distinct_users,
    q5_region_revenue,
    topk_orders_by_price,
)


def test_approx_distinct_within_5pct(spark, sf_dir):
    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(1, 0.05 * r.exact_users), r


def test_q5_broadcasts_dimensions(spark, sf_dir):
    """Scale guard: region/nation must ride broadcast joins, never a
    shuffle exchange of the fact side keyed on tiny dims."""
    plan = q5_region_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    """Scale guard: global ORDER BY + LIMIT must plan TakeOrderedAndProject
    (per-partition heaps), not a full sort."""
    plan = topk_orders_by_price(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Scale guard: a simple comparison filter must appear in PushedFilters
    of the parquet scan."""
    from hadoop_stuff_spark.catalog import load_table

    df = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice,100000.0)" in plan


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """The scale path (mergeable approx_percentile sketch) tracks the exact
    sort-based percentile within 1% relative error."""
    from pyspark.sql import functions as F

    from hadoop_stuff_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    both = orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.95)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.95, 10000)").alias("approx"),
    )
    for r in both.collect():
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.01, r


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Runtime bloom-filter join pruning: with a selective dimension filter,
    Catalyst injects a bloom_filter_agg on the build side and a might_contain
    probe into the fact scan — rows that can't join are dropped BEFORE the
    shuffle. Thresholds here are size-based (defaults trigger at
    creation<=10MB / application>=10GB); the local testdata is below both,
    so the test lowers them — at 100 TB the defaults fire on their own."""
    from pyspark.sql import functions as F

    from hadoop_stuff_spark.catalog import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan

        with_filter = j.count()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    # equivalence: pruning must not change the join result
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    assert with_filter == li.join(o, li.l_orderkey == o.o_orderkey).count()
