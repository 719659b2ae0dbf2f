"""SCD2 history maintenance: all four row fates across merges, and
point-in-time reads reconstruct each snapshot exactly."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.operators.scd import scd2_init, scd2_merge


def _hist(spark):
    s1 = spark.createDataFrame(
        [(1, "gold", 10.0), (2, "silver", 20.0), (3, "gold", 30.0)],
        "id long, tier string, bal double",
    )
    h = scd2_init(s1, "2026-01-01 00:00:00")
    s2 = spark.createDataFrame(
        [
            (1, "gold", 10.0),      # unchanged
            (2, "gold", 20.0),      # tier changed
            (4, "bronze", 40.0),    # new key (3 deleted)
        ],
        "id long, tier string, bal double",
    )
    return scd2_merge(h, s2, ["id"], ["tier", "bal"], "2026-02-01 00:00:00")


def test_scd2_row_fates(spark):
    rows = sorted(
        (r.id, r.tier, str(r.valid_from.date()), r.valid_to and str(r.valid_to.date()))
        for r in _hist(spark).collect()
    )
    assert rows == [
        (1, "gold", "2026-01-01", None),            # stayed open
        (2, "gold", "2026-02-01", None),            # new version
        (2, "silver", "2026-01-01", "2026-02-01"),  # closed (changed)
        (3, "gold", "2026-01-01", "2026-02-01"),    # closed (deleted)
        (4, "bronze", "2026-02-01", None),          # brand new
    ]


def test_scd2_point_in_time_reconstructs_snapshots(spark):
    h = _hist(spark)

    def as_of(ts):
        return {
            (r.id, r.tier, r.bal)
            for r in h.filter(
                (F.col("valid_from") <= F.lit(ts).cast("timestamp"))
                & (
                    F.col("valid_to").isNull()
                    | (F.col("valid_to") > F.lit(ts).cast("timestamp"))
                )
            ).collect()
        }

    assert as_of("2026-01-15") == {(1, "gold", 10.0), (2, "silver", 20.0), (3, "gold", 30.0)}
    assert as_of("2026-02-15") == {(1, "gold", 10.0), (2, "gold", 20.0), (4, "bronze", 40.0)}


def test_scd2_merge_is_idempotent_on_same_snapshot(spark):
    s1 = spark.createDataFrame([(1, "a", 1.0)], "id long, tier string, bal double")
    h = scd2_init(s1, "2026-01-01 00:00:00")
    h2 = scd2_merge(h, s1, ["id"], ["tier", "bal"], "2026-02-01 00:00:00")
    assert [
        (r.id, str(r.valid_from.date()), r.valid_to) for r in h2.collect()
    ] == [(1, "2026-01-01", None)]
