"""Bucketed-layout co-located join: the Exchange disappears from the plan
when both sides are bucketed on the join key (SCALE.md §3)."""

import pytest
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, sf_dir, no_broadcast, tmp_path_factory):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 4)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 4)
    try:
        joined = bucketed_join(spark, "lineitem_b", "orders_b", ("l_orderkey", "o_orderkey"))

        plan = _physical_plan(joined)
        assert "Exchange" not in plan, plan

        # un-bucketed control: the same join NEEDS two exchanges
        control = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        assert "Exchange" in _physical_plan(control)

        # correctness: identical row count either way
        assert joined.count() == control.count()

        # groupBy on the bucket key is shuffle-free too
        agg = (
            spark.table("lineitem_b")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert "Exchange" not in _physical_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
