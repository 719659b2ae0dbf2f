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
