"""Privacy enforcement: k-anonymity by suppression — the companion to
`quality.k_anonymity_report` (the audit finds re-identifiable rows; this
makes the table safe to ship).

Suppression is the simplest standard enforcement: rows whose
quasi-identifier equivalence class is smaller than k get their quasi
values NULLed (they collapse into one "suppressed" class), everything
else passes through untouched. Generalization hierarchies (coarsen
city→region→country until k holds) are the richer alternative but need
domain ontologies; suppression is what a pipeline can always do.

Scale shape: ONE window count over the quasi-key partitioning (a hash
shuffle on the quasi tuple — no second scan, no self-join: the class
size rides each row), then a map-side conditional projection. The same
plan at any table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table


def suppress_below_k(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """NULL the quasi-identifier values of every row whose equivalence
    class has fewer than ``k`` members (adds a ``suppressed`` flag) —
    and, because the suppressed rows merge into ONE all-NULL class that
    can itself be smaller than k (an all-NULL pattern on a single row
    re-identifies exactly like any other unique pattern), rows of a
    post-suppression class still below k are DROPPED (record
    suppression, the standard escalation when cell suppression cannot
    reach k). The output is therefore k-anonymous unconditionally:
    every surviving class — including the NULL class, which also
    absorbs pre-existing all-NULL rows — has >= k members.

    Raises on input columns that collide with the reserved internal
    names (the repo's score_quality convention) rather than silently
    shadowing user data."""
    reserved = {"suppressed", "_class_n", "_post_n"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"input already has reserved column(s) {sorted(clash)}; "
            "rename them before suppress_below_k"
        )
    w = Window.partitionBy(*quasi_cols)
    tagged = df.withColumn("_class_n", F.count(F.lit(1)).over(w))
    below = F.col("_class_n") < k
    out = tagged
    for c in quasi_cols:
        out = out.withColumn(c, F.when(below, F.lit(None)).otherwise(F.col(c)))
    out = out.withColumn("suppressed", below).drop("_class_n")
    # second pass over the POST-suppression quasi values: only the
    # all-NULL class can have shrunk below k (>=k classes are untouched),
    # so one re-check suffices — drop it if it is still re-identifiable
    w2 = Window.partitionBy(*quasi_cols)
    return (
        out.withColumn("_post_n", F.count(F.lit(1)).over(w2))
        .filter(F.col("_post_n") >= k)
        .drop("_post_n")
    )


def k_suppress_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification: enforce k=5 on customers under the
    (nation, market segment) quasi pair; emit the per-customer result
    (key, post-enforcement quasi values, flag) — value-exact against the
    oracle's window recomputation."""
    cust = load_table(spark, sf_dir, "customer")
    out = suppress_below_k(cust, ["c_nationkey", "c_mktsegment"], 5)
    return out.select(
        "c_custkey", "c_nationkey", "c_mktsegment", "suppressed"
    ).orderBy("c_custkey")


K_SUPPRESS_SQL = """
WITH tagged AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS class_n
  FROM customer
), cell AS (
  SELECT c_custkey,
         CASE WHEN class_n < 5 THEN NULL ELSE c_nationkey END AS c_nationkey,
         CASE WHEN class_n < 5 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
         class_n < 5 AS suppressed
  FROM tagged
), post AS (
  SELECT *, count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS post_n
  FROM cell
)
SELECT c_custkey, c_nationkey, c_mktsegment, suppressed
FROM post WHERE post_n >= 5 ORDER BY c_custkey
"""
