"""Table profiling — per-column data-quality stats in ONE scan.

What a 100 TB training-data pipeline runs before/after every transform:
row counts, null counts, distinct estimates, numeric ranges. All columns
are profiled in a single pass (one partial→final aggregate, no per-column
scans); the per-column rows are produced by unpivoting the single
aggregate row, so the plan cost is one scan regardless of column count.

The exact stats (count/nulls/min/max) are oracle-certified; distinct
counts use HLL++ sketches (approx_count_distinct) because exact
per-column distincts would be one shuffle PER COLUMN at scale — the
sketch keeps the whole profile map-side mergeable. The registry query
therefore exposes the exact parts for the hash-compare and keeps the
sketch column rows-only-tested (<5%% relative error, like
`approx_distinct_users`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table

_NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-scan profile: a row per column with n_rows, n_nulls, and (for
    numeric columns) min/max as doubles. Distinct estimates included as
    ``approx_distinct`` (HLL++, not exact by design)."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__ad_{c}"))
        if types.get(c, "").split("(")[0] in _NUMERIC:
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
            F.col(f"__ad_{c}").cast("long").alias("approx_distinct"),
            (
                F.col(f"__min_{c}")
                if f"__min_{c}" in one.columns
                else F.lit(None).cast("double")
            ).alias("min_value"),
            (
                F.col(f"__max_{c}")
                if f"__max_{c}" in one.columns
                else F.lit(None).cast("double")
            ).alias("max_value"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-certified slice of the profiler (exact stats only — the HLL
    column is dropped for the hash-compare; `approx_distinct_users` covers
    sketch accuracy separately)."""
    orders = load_table(spark, sf_dir, "orders")
    return profile_table(
        orders, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    ).select("column", "n_rows", "n_nulls", "min_value", "max_value")


PROFILE_SQL = """
SELECT 'o_orderkey' AS column, count(*) AS n_rows,
       count(*) - count(o_orderkey) AS n_nulls,
       CAST(min(o_orderkey) AS DOUBLE) AS min_value,
       CAST(max(o_orderkey) AS DOUBLE) AS max_value FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE) FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
       CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       NULL, NULL FROM orders
"""


def outlier_orders_by_zscore(
    spark: SparkSession, sf_dir: str, z_cut: float = 2.0
) -> DataFrame:
    """Per-priority-class z-score outlier report over order totals: how
    many orders sit more than ``z_cut`` sample standard deviations from
    their class mean, and how extreme the worst one is — the cheap
    distribution-shift tripwire a data-quality gate runs per ingest
    batch.

    Plan shape: one shuffle on the class key for the avg/stddev window
    (class stats computed once, streamed past every row — no self-join
    of facts to a stats subquery), then a map-side-partial re-agg to one
    row per class. At 100 TB the window state per class is two scalars;
    skewed class sizes don't matter because the window is an aggregate,
    not a sort."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    z = (F.col("o_totalprice") - F.avg("o_totalprice").over(w)) / F.stddev_samp(
        "o_totalprice"
    ).over(w)
    return (
        o.select("o_orderpriority", F.abs(z).alias("abs_z"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("abs_z") > z_cut, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max("abs_z"), 3).alias("max_abs_z"),
        )
        .orderBy("o_orderpriority")
    )


OUTLIER_ZSCORE_SQL = """
WITH z AS (
  SELECT o_orderpriority,
         abs((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority))
             / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderpriority)) AS abs_z
  FROM orders
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN abs_z > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(abs_z), 3) AS max_abs_z
FROM z
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
