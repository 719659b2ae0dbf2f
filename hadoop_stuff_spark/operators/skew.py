"""Skew mitigation patterns (SURVEY.md §4 — 'AQE skew handling' is free for
*joins Spark plans itself*; these are the two cases that still need explicit
salting at 100 TB, expressed as reusable operators).

The reference never had the problem (single constant reduce key was its
ONLY aggregation — RecordCount.java:34 — i.e. 100% skew absorbed by its
hand-built combiner). Spark's partial aggregation does the same for
associative aggs automatically. What partial agg does NOT fix:

1. **Skewed shuffle-join keys**: every row of a hot key lands on one task.
   AQE skew-join splits the *partition*, but only for sort-merge joins it
   planned; a hot key inside one partition of a hash join still serializes.
   `salted_join` spreads the hot key over ``n_salts`` tasks by salting the
   big side and replicating the small side n_salts× — the standard
   replicate-fragment join.
2. **Holistic aggregates** (collect_list/set, exact percentiles): partial
   agg can't shrink them, so a hot group's payload converges on one task.
   `salted_two_phase_agg` splits each group into salted subgroups,
   aggregates those in parallel, then merges the (much smaller)
   per-subgroup results.

Both are correctness-preserving rewrites — certified against plain-SQL
DuckDB oracles in plans/registry (`skew_salted_join_enriched_counts`,
`skew_salted_heavy_hitters`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from hadoop_stuff_spark.catalog import load_table, spread
from hadoop_stuff_spark.functions.money import sum_2dp_exact, sum_2dp_exact_sql


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicate-fragment equi-join for a skewed big-side key.

    big rows get a uniform random salt in [0, n_salts); the small side is
    exploded n_salts× (one copy per salt value) so every (key, salt)
    fragment finds its match. The hot key's rows now spread over n_salts
    tasks instead of one. Cost: small side shuffled n_salts× — use for
    genuinely small/dim sides (or broadcast-sized `small`, where the
    explode is free parallelism).

    The salt is `pmod(hash(monotonically_increasing_id + key), n)`-free:
    we use rand() — no semantic constraint, any uniform assignment works,
    and determinism of the JOIN RESULT is preserved regardless of salt.

    Only ``how`` in {'inner', 'left'} is correct under this rewrite: the
    small side is replicated n_salts×, so right/full/semi/anti variants
    would emit unmatched small-side rows n_salts times (or wrong semi/anti
    membership). For those, salt the OTHER side or use AQE skew-join."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left'}}, got {how!r}: "
            "the replicated small side makes right/full/semi/anti incorrect"
        )
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return out.drop("_salt")


def salted_two_phase_agg(
    df: DataFrame,
    group_col: str,
    agg_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase holistic aggregation: phase 1 aggregates (group, salt)
    subgroups in parallel (n_salts-way spread of each hot group), phase 2
    merges subgroup results per group. Shown for collect_set-style distinct
    accumulation — the shape where partial aggregation cannot shrink the
    map-side payload. Output: per-group distinct count + total."""
    phase1 = (
        df.withColumn("_salt", F.pmod(F.hash(agg_col), F.lit(n_salts)))
        .groupBy(group_col, "_salt")
        .agg(
            F.collect_set(agg_col).alias("_vals"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    # hashing the agg VALUE to the salt makes subgroup sets disjoint, so
    # phase 2 can sum set sizes instead of re-merging the sets themselves
    return phase1.groupBy(group_col).agg(
        F.sum(F.size("_vals")).cast("long").alias("n_distinct"),
        F.sum("_n").cast("long").alias("n_rows"),
    )


# --- registry queries --------------------------------------------------------


def skew_salted_join_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join of events (big, potentially hot user_ids) to customer
    (small side, replicated n_salts×), then per-nation event counts —
    result identical to the plain join, certified by the oracle."""
    ev = spread(load_table(spark, sf_dir, "events")).select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(ev, cust, "user_id", "c_custkey", n_salts=8)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_2dp_exact("value").alias("total_value"),
    )


SALTED_JOIN_SQL = f"""
SELECT c_nationkey, count(*) AS n_events, {sum_2dp_exact_sql('value', 'total_value')}
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
"""


def skew_salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase distinct-user count per event_type (the holistic-agg
    skew pattern); oracle = plain COUNT(DISTINCT)."""
    ev = spread(load_table(spark, sf_dir, "events"))
    return salted_two_phase_agg(ev, "event_type", "user_id", n_salts=8).select(
        "event_type", "n_distinct", "n_rows"
    )


SALTED_AGG_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct, count(*) AS n_rows
FROM events GROUP BY event_type
"""
