"""Skew-mitigation operators: salted join / two-phase agg must be exact
rewrites of their plain forms, including on pathologically hot keys."""

from pyspark.sql import functions as F

from hadoop_stuff_spark.operators.skew import salted_join, salted_two_phase_agg


def test_salted_join_equals_plain_join_on_hot_key(spark):
    # 10k rows, 90% of them on one hot key — the shape AQE's partition
    # splitting can't always save inside a single hash partition
    big = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k2"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    plain = (
        big.join(small, big.k == small.k2)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
    )
    salted = (
        salted_join(big, small, "k", "k2", n_salts=8)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_outer_variant(spark):
    big = spark.range(50).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    small = spark.range(3).select(F.col("id").alias("k2"))
    plain_n = big.join(small, big.k == small.k2, "left").count()
    # left join: unmatched big rows carry their salt but find no (key,salt)
    # partner; they must survive exactly once
    salted_n = salted_join(big, small, "k", "k2", n_salts=4, how="left").count()
    assert plain_n == salted_n == 50


def test_salted_join_rejects_unsupported_how(spark):
    """ADVICE r1: the replicate-fragment rewrite is only correct for
    inner/left — anything else must raise, not silently duplicate
    unmatched small-side rows n_salts times."""
    import pytest

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("k2"))
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", "k2", how=how)


def test_salted_two_phase_agg_matches_exact_distinct(spark):
    df = spark.range(20000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        # hot group 0 gets low-cardinality values; others high
        F.when(F.col("id") % 3 == 0, F.col("id") % 17)
        .otherwise(F.col("id"))
        .alias("v"),
    )
    expected = {
        (r["g"], r["nd"], r["n"])
        for r in df.groupBy("g")
        .agg(F.countDistinct("v").alias("nd"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        (r["g"], r["n_distinct"], r["n_rows"])
        for r in salted_two_phase_agg(df, "g", "v", n_salts=8).collect()
    }
    assert got == expected
