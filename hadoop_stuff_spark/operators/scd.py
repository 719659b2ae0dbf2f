"""Slowly-changing-dimension (type 2) maintenance — keep full history of
a dimension as snapshots arrive, the standard warehouse answer to
"what did this customer's record say LAST quarter?".

`scd2_merge(history, snapshot, ...)` produces the new history table:
- open rows whose tracked attributes are unchanged stay open;
- open rows whose attributes changed (or whose key vanished) are CLOSED
  (valid_to = batch_ts);
- changed and brand-new keys get a fresh OPEN row (valid_from =
  batch_ts, valid_to = NULL).

Plan shape: ONE full-outer join between the open slice of history and
the snapshot on the business key — both sides shuffle on the key once;
closed history rides through untouched via union (no join, no rewrite
amplification: history is append-mostly, the only rewritten rows are
the ones being closed). At 100 TB the history table is partitioned by
valid_from date so each merge appends new partitions and rewrites only
the open slice — the same immutable-history stance as the dedup stores
(operators/incremental.py).

Reference provenance: the reference has no mutation story at all (HDFS
append-only, SURVEY.md §1); SCD2 is how a warehouse gets "updates"
without ever updating in place — the engine-native version of the same
append-only constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table


def scd2_init(snapshot: DataFrame, batch_ts: str) -> DataFrame:
    """First load: every snapshot row becomes an open version."""
    return snapshot.select(
        "*",
        F.lit(batch_ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_ts: str,
) -> DataFrame:
    """New history = closed rows (untouched) ∪ still-current open rows ∪
    newly-closed rows ∪ new open versions. Change detection is null-safe
    equality over ``tracked_cols``."""
    ts = F.lit(batch_ts).cast("timestamp")
    closed = history.filter(F.col("valid_to").isNotNull())
    open_rows = history.filter(F.col("valid_to").isNull())

    snap = snapshot.select(
        *[F.col(c).alias(f"__s_{c}") for c in key_cols],
        *[F.col(c).alias(f"__sv_{c}") for c in tracked_cols],
    )
    key_eq = [F.col(k) == F.col(f"__s_{k}") for k in key_cols]
    j = open_rows.join(snap, key_eq, "full_outer")

    in_hist = F.col(key_cols[0]).isNotNull()
    in_snap = F.col(f"__s_{key_cols[0]}").isNotNull()
    changed = ~F.struct(*[F.col(c) for c in tracked_cols]).eqNullSafe(
        F.struct(*[F.col(f"__sv_{c}") for c in tracked_cols])
    )

    hist_side_cols = [c for c in history.columns]
    # 1. open rows still matching the snapshot exactly: stay open
    unchanged = j.filter(in_hist & in_snap & ~changed).select(*hist_side_cols)
    # 2. open rows changed or deleted: closed at batch_ts
    newly_closed = (
        j.filter(in_hist & (~in_snap | changed))
        .select(*[c for c in hist_side_cols if c != "valid_to"], ts.alias("valid_to"))
        .select(*hist_side_cols)
    )
    # 3. new version for changed keys + brand-new keys: open at batch_ts
    new_open = (
        j.filter(in_snap & (~in_hist | changed))
        .select(
            *[F.col(f"__s_{k}").alias(k) for k in key_cols],
            *[F.col(f"__sv_{c}").alias(c) for c in tracked_cols],
            ts.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
        .select(*hist_side_cols)
    )
    return closed.unionByName(unchanged).unionByName(newly_closed).unionByName(new_open)


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification: simulate two deterministic snapshots of customer
    (snapshot 2 moves every third customer's acctbal and drops every
    50th), merge, and return the full history ordered — exercises all
    four row fates (kept-open, closed-changed, closed-deleted, new-open;
    'new' keys appear via the dropped-then-readded complement)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    snap1 = cust.filter(F.col("c_custkey") % 50 != 1)  # every 50th missing at t1
    snap2 = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.round(F.col("c_acctbal") + 100.0, 2)).otherwise(
            F.col("c_acctbal")
        ),
    ).filter(F.col("c_custkey") % 50 != 2)  # different 50th missing at t2

    hist = scd2_init(snap1, "2026-01-01 00:00:00")
    hist = scd2_merge(
        hist,
        snap2,
        ["c_custkey"],
        ["c_mktsegment", "c_acctbal"],
        "2026-02-01 00:00:00",
    )
    return hist.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
    ).orderBy("c_custkey", "valid_from", "c_acctbal")


SCD2_SQL = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal FROM customer
), snap1 AS (
  SELECT * FROM cust WHERE c_custkey % 50 <> 1
), snap2 AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 3 = 0 THEN round(c_acctbal + 100.0, 2)
              ELSE c_acctbal END AS c_acctbal
  FROM cust WHERE c_custkey % 50 <> 2
), joined AS (
  SELECT s1.c_custkey AS k1, s1.c_mktsegment AS m1, s1.c_acctbal AS b1,
         s2.c_custkey AS k2, s2.c_mktsegment AS m2, s2.c_acctbal AS b2
  FROM snap1 s1 FULL OUTER JOIN snap2 s2 ON s1.c_custkey = s2.c_custkey
)
SELECT * FROM (
  -- open rows unchanged: stay open from t1
  SELECT k1 AS c_custkey, m1 AS c_mktsegment, b1 AS c_acctbal,
         '2026-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
  FROM joined WHERE k1 IS NOT NULL AND k2 IS NOT NULL AND m1 = m2 AND b1 = b2
  UNION ALL
  -- changed or deleted: closed at t2
  SELECT k1, m1, b1, '2026-01-01', '2026-02-01'
  FROM joined WHERE k1 IS NOT NULL AND (k2 IS NULL OR m1 <> m2 OR b1 <> b2)
  UNION ALL
  -- changed + brand-new keys: new open version at t2
  SELECT k2, m2, b2, '2026-02-01', NULL
  FROM joined WHERE k2 IS NOT NULL AND (k1 IS NULL OR m1 <> m2 OR b1 <> b2)
)
ORDER BY c_custkey, valid_from, c_acctbal
"""
