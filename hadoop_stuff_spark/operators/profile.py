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

    Exactness (cross-engine convention — ADVICE r6): class stats come
    from explicit integer-cent sum/sumsq accumulators (decimal-exact, so
    order-independent — builtin avg/stddev update order is not
    contractual), and |z| is rounded to 6 dp BEFORE the z_cut comparison
    on both engines, so a boundary row cannot flip n_outliers between
    engines or partitionings. Zero-variance / n<2 classes yield NULL z
    instead of an ANSI divide-by-zero (the engine-wide degenerate-input
    rule).

    Plan shape: one shuffle on the class key for the windowed sums
    (class stats computed once, streamed past every row — no self-join
    of facts to a stats subquery), then a map-side-partial re-agg to one
    row per class. At 100 TB the window state per class is three
    scalars; skewed class sizes don't matter because the window is an
    aggregate, not a sort."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    v = F.col("o_totalprice")
    cents = F.round(v * 100, 0).cast("decimal(19,0)")
    w = Window.partitionBy("o_orderpriority")
    n = F.count(v).over(w)
    # exact integer sums (cents / cents², decimal — sum of squares at
    # 100 TB overflows bigint, decimal(38,0) does not), THEN one
    # deterministic cast to double: both engines see identical operands
    s = F.sum(cents).over(w).cast("double") / 100.0
    ss = F.sum(cents * cents).over(w).cast("double") / 10000.0
    var = (ss - s * s / n) / (n - 1)
    abs_z = F.when((n >= 2) & (var > 0), F.round(F.abs(v - s / n) / F.sqrt(var), 6))
    return (
        o.select("o_orderpriority", abs_z.alias("abs_z"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("abs_z") > z_cut, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max("abs_z"), 3).alias("max_abs_z"),
        )
        .orderBy("o_orderpriority")
    )


OUTLIER_ZSCORE_SQL = """
WITH sums AS (
  SELECT o_orderpriority, o_totalprice,
         count(o_totalprice) OVER w AS n,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS HUGEINT)) OVER w
              AS DOUBLE) / 100.0 AS s,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS HUGEINT)
                  * CAST(round(o_totalprice * 100, 0) AS HUGEINT)) OVER w
              AS DOUBLE) / 10000.0 AS ss
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority)
), z AS (
  SELECT o_orderpriority,
         CASE WHEN n >= 2 AND (ss - s * s / n) / (n - 1) > 0 THEN
           round(abs(o_totalprice - s / n)
                 / sqrt((ss - s * s / n) / (n - 1)), 6)
         END AS abs_z
  FROM sums
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN abs_z > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(abs_z), 3) AS max_abs_z
FROM z
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-significant-digit
    shares vs the log10(1 + 1/d) expectation — the classic fabricated-data
    tripwire a data-quality gate runs over any money column.

    The first digit is taken from the INTEGER part via exact bigint→string
    conversion (no log10 on the data path): float log/pow on the values
    themselves can straddle a ulp between engines, but integer rendering is
    exact and portable. Values below 1 are excluded (no integer first
    digit). Plan shape: one scan, one 9-row aggregate; the total for the
    share denominators rides a window over the 9-row result, so the fact
    table is read once."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        o.filter(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = F.sum("n_orders").over(Window.partitionBy())
    observed = F.col("n_orders") / total
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return counts.select(
        "digit",
        "n_orders",
        F.round(observed, 4).alias("observed_share"),
        F.round(benford, 4).alias("benford_share"),
        F.round(F.abs(observed - benford), 4).alias("abs_gap"),
    ).orderBy("digit")


BENFORD_SQL = """
WITH counts AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*) AS n_orders
  FROM orders WHERE o_totalprice >= 1
  GROUP BY 1
)
SELECT digit, n_orders,
       round(n_orders * 1.0 / sum(n_orders) OVER (), 4) AS observed_share,
       round(log10(1.0 + 1.0 / digit), 4) AS benford_share,
       round(abs(n_orders * 1.0 / sum(n_orders) OVER () - log10(1.0 + 1.0 / digit)), 4) AS abs_gap
FROM counts
ORDER BY digit
"""


def histogram_order_values(
    spark: SparkSession, sf_dir: str, n_bins: int = 20
) -> DataFrame:
    """Equi-width histogram of order totals with data-driven bounds — the
    one-pass distribution profile a pipeline materializes per column per
    ingest batch.

    Plan shape: the min/max bounds are ONE aggregate row broadcast back
    over the facts (scalar-subquery shape, same as q22's stats frame), so
    the cost is two scans of one column and a 20-row aggregate — no sort,
    no per-bin passes. The top bound is clamped into the last bin so
    max-valued rows land in bin n_bins-1 rather than a one-row overflow
    bin. Degenerate input (min == max, e.g. a constant column or a
    single-row batch — ADVICE r6) short-circuits every row into bin 0:
    the unguarded floor((v - lo) / 0.0) is 0/0 = NaN, whose int cast is
    an ANSI crash on Spark and a cast failure in DuckDB."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / n_bins
    bin_id = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width),
                F.lit(n_bins - 1),
            )
        )
        .cast("int")
    )
    agg = (
        o.join(F.broadcast(bounds))
        .select(bin_id.alias("bin"), "lo", "hi")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
    )
    edge = (F.col("hi") - F.col("lo")) / n_bins
    return agg.select(
        "bin",
        "n_orders",
        F.round(F.col("lo") + F.col("bin") * edge, 2).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * edge, 2).alias("bin_hi"),
    ).orderBy("bin")


HISTOGRAM_SQL = """
WITH bounds AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
), binned AS (
  SELECT CAST(CASE WHEN hi = lo THEN 0
              ELSE least(floor((o_totalprice - lo) / ((hi - lo) / 20)), 19)
              END AS INTEGER) AS bin,
         lo, hi
  FROM orders CROSS JOIN bounds
)
SELECT bin, count(*) AS n_orders,
       round(min(lo) + bin * ((min(hi) - min(lo)) / 20), 2) AS bin_lo,
       round(min(lo) + (bin + 1) * ((min(hi) - min(lo)) / 20), 2) AS bin_hi
FROM binned
GROUP BY bin
ORDER BY bin
"""


def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: order totals winsorized at the group's
    own exact p05/p95 (values clipped, not dropped) alongside the raw
    mean — the outlier-resistant summary a data-quality report pairs with
    z-score outlier listings (``outlier_orders_by_zscore``).

    Plan shape: the exact percentiles ride the SAME two-phase aggregate
    pass that a plain mean would use (Spark ``percentile`` == DuckDB
    ``quantile_cont``, the established portable pair), computed per group
    in pass one; pass two re-streams the facts against the broadcast
    5-row bounds frame to clip and fixed-point-sum. Means are exact
    integer-cent sums / counts, so they are order-independent and
    engine-portable."""
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    bounds = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.05)"), 4).alias("p05"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    cents = lambda c: F.sum(F.round(c * 100.0, 0).cast("long"))  # noqa: E731
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.first("n_orders").alias("n_orders"),
            F.first("p05").alias("p05"),
            F.first("p95").alias("p95"),
            F.round(cents(F.col("o_totalprice")) / 100.0 / F.count(F.lit(1)), 4).alias(
                "raw_mean"
            ),
            F.round(cents(clipped) / 100.0 / F.count(F.lit(1)), 4).alias(
                "winsorized_mean"
            ),
        )
        .orderBy("o_orderpriority")
    )


WINSORIZED_SQL = """
WITH bounds AS (
  SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.05), 4) AS p05,
         round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT o.o_orderpriority,
       CAST(min(b.n_orders) AS BIGINT) AS n_orders,
       min(b.p05) AS p05,
       min(b.p95) AS p95,
       round(sum(CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT)) / 100.0 / count(*), 4) AS raw_mean,
       round(sum(CAST(round(least(greatest(o.o_totalprice, b.p05), b.p95) * 100.0, 0) AS BIGINT)) / 100.0 / count(*), 4) AS winsorized_mean
FROM orders o JOIN bounds b USING (o_orderpriority)
GROUP BY 1
ORDER BY 1
"""


def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the distribution of rows-per-key for the
    orders→customer join key — max, p99, mean rows per key and the skew
    factor (max/mean) — the report that decides whether a join needs the
    salting operators (``operators/skew.py``) before it ships.

    Plan shape: one map-side-partial count per key, then a single tiny
    aggregate over the per-key counts (exact percentile over key-count
    rows — key-cardinality-sized, not fact-sized)."""
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_rows"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("n_rows_total"),
        F.max("n_rows").alias("max_per_key"),
        F.round(F.expr("percentile(n_rows, 0.99)"), 4).alias("p99_per_key"),
        F.round(F.sum("n_rows") * 1.0 / F.count(F.lit(1)), 4).alias("mean_per_key"),
        F.round(
            F.max("n_rows") / (F.sum("n_rows") * 1.0 / F.count(F.lit(1))), 4
        ).alias("skew_factor"),
    )


SKEW_PROFILE_SQL = """
WITH per_key AS (
  SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY 1
)
SELECT count(*) AS n_keys,
       CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
       CAST(max(n_rows) AS BIGINT) AS max_per_key,
       round(quantile_cont(n_rows, 0.99), 4) AS p99_per_key,
       round(sum(n_rows) * 1.0 / count(*), 4) AS mean_per_key,
       round(max(n_rows) / (sum(n_rows) * 1.0 / count(*)), 4) AS skew_factor
FROM per_key
"""


def gini_doc_length_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source concentration profile of document lengths: Gini
    coefficient and top-decile character share — the "does 1% of the
    documents carry half the tokens" diagnostic that decides whether a
    corpus needs length-capping or resampling before training (a
    high-Gini source dominates the token budget with few, huge
    documents).

    Exactness: Gini uses the rank identity
    G = (2·Σ(i·x_(i)) − (n+1)·Σx) / (n·Σx) over ascending ranks i.
    Σ(i·x) grows as n²/2·mean_chars per source — an int64 sum would
    overflow around ~4·10⁷ docs per source at 10⁴ mean chars (the same
    n²-growth class ADVICE r9 flagged on the revenue sibling), well
    inside a 100 TB corpus — so i·x and every n·Σx-scale product run
    in DOUBLE on both engines: gini needs ~6 significant digits and
    the double sum's partial-agg ordering ulps are erased by the 6 dp
    round (the house float-agg convention). Σx stays exact int64;
    ranks tie-break on doc_id; the top-decile cut keeps ranks >
    floor(0.9·n), integer-exact.

    Scale shape: the rank window sorts WITHIN each source partition
    (one hash-shuffle on source, never a global sort); everything after
    is a per-source aggregate — output rows = |sources|.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n_src"),
    )
    n = F.col("n_docs")
    total = F.col("total_chars")
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("i").cast("double") * F.col("n_chars")).alias("_iwx"),
            F.sum(
                F.when(
                    F.col("i") > F.floor(F.lit(0.9) * F.col("n_src")),
                    F.col("n_chars"),
                ).otherwise(F.lit(0))
            ).alias("_top_chars"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            # total_chars = 0 (all-empty source): NULL, matching the
            # oracle — an unguarded division is an ANSI crash
            F.when(
                total > 0,
                F.round(
                    (
                        F.lit(2.0) * F.col("_iwx")
                        - (n + 1).cast("double") * total.cast("double")
                    )
                    / (n.cast("double") * total.cast("double")),
                    6,
                ),
            ).alias("gini"),
            F.when(
                total > 0,
                F.round(
                    F.col("_top_chars").cast("double") / total.cast("double"),
                    6,
                ),
            ).alias("top_decile_share"),
        )
        .orderBy("source")
    )


GINI_SQL = """
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars, doc_id
         ) AS i,
         count(*) OVER (PARTITION BY source) AS n_src
  FROM documents
), agg AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         sum(CAST(i AS DOUBLE) * n_chars) AS iwx,
         sum(CASE WHEN i > floor(0.9 * n_src) THEN n_chars ELSE 0 END)
           AS top_chars
  FROM ranked GROUP BY source
)
SELECT source, n_docs, total_chars,
       round((2.0 * iwx - CAST(n_docs + 1 AS DOUBLE) * total_chars)
             / (CAST(n_docs AS DOUBLE) * total_chars), 6) AS gini,
       round(CAST(top_chars AS DOUBLE) / CAST(total_chars AS DOUBLE), 6)
         AS top_decile_share
FROM agg ORDER BY source
"""


def ab_value_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout over event values: users are
    hash-assigned to arms (the md5-keep predicate — the same user lands
    in the same arm on every engine, run, and partitioning), and each
    event_type reports per-arm n/mean plus the Welch test statistic
    t = (mean_a - mean_b) / sqrt(var_a/n_a + var_b/n_b) — the unequal-
    variance form, the safe default for experiment analysis.

    Exactness: explicit sum/sumsq algebra (no stddev builtins), with
    the accumulators FIXED-POINTED at micro-unit (1e-6) resolution —
    round(value·10⁶) as exact decimal integer sums (ADVICE r6: plain
    double sums are summation-order-dependent across partitionings, and
    a 6-dp round on the final statistic does not bound accumulated
    drift for large groups; decimal rather than bigint because the
    sum of squares overflows int64 at scale). Each exact integer sum is
    cast to double ONCE, so both engines compute the statistic from
    bit-identical operands. sqrt is IEEE-exact, all rounded to 6 dp.
    Event types where either arm has <2 events or both variances are 0
    are excluded (the statistic is undefined; under ANSI the division
    would raise — the engine-wide degenerate-input rule).

    Scale shape: ONE scan, one hash aggregate on event_type with the
    arm folded in as conditional sums (map-side partial) — adding an
    arm or a metric adds a column, not a pass.
    """
    from hadoop_stuff_spark.operators.sampling import deterministic_keep

    ev = load_table(spark, sf_dir, "events")
    # the repo's canonical md5-keep predicate at fraction 0.5 — NOT a
    # hand-rolled copy, so helper fixes reach this assignment too
    in_a = deterministic_keep("user_id", 0.5, salt="ab1:")
    v = F.col("value")
    v_fp = F.round(v * 1000000.0, 0).cast("decimal(19,0)")  # micro-units

    def _arm(pred, tag):
        # n counts only rows that contribute to the sums: a NULL value
        # in n but not in s/ss would silently bias mean and variance
        counted = pred & v.isNotNull()
        return [
            F.sum(F.when(counted, 1).otherwise(0)).alias(f"{tag}_n"),
            F.sum(F.when(counted, v_fp).otherwise(F.lit(0))).alias(f"{tag}_s"),
            F.sum(F.when(counted, v_fp * v_fp).otherwise(F.lit(0))).alias(f"{tag}_ss"),
        ]

    agg = ev.groupBy("event_type").agg(*_arm(in_a, "a"), *_arm(~in_a, "b"))
    na, nb = F.col("a_n"), F.col("b_n")
    sa = F.col("a_s").cast("double") / 1000000.0
    sb = F.col("b_s").cast("double") / 1000000.0
    ssa = F.col("a_ss").cast("double") / 1000000000000.0
    ssb = F.col("b_ss").cast("double") / 1000000000000.0
    ma = sa / na
    mb = sb / nb
    va = (ssa - sa * sa / na) / (na - 1)
    vb = (ssb - sb * sb / nb) / (nb - 1)
    se2 = va / na + vb / nb
    return (
        agg.filter((na >= 2) & (nb >= 2))
        .select(
            "event_type",
            na.alias("n_a"),
            nb.alias("n_b"),
            F.round(ma, 6).alias("mean_a"),
            F.round(mb, 6).alias("mean_b"),
            se2.alias("_se2"),
            F.round((ma - mb) / F.sqrt(se2), 6).alias("welch_t"),
        )
        .filter(F.col("_se2") > 0)
        .drop("_se2")
        .orderBy("event_type")
    )


AB_ZTEST_SQL = """
WITH t AS (
  SELECT event_type,
         substring(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 6) < '800000'
           AS in_a,
         value
  FROM events
), fp AS (
  SELECT event_type, in_a, value,
         CAST(round(value * 1000000.0, 0) AS HUGEINT) AS v_fp
  FROM t
), agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN in_a AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         sum(CASE WHEN in_a AND value IS NOT NULL THEN v_fp ELSE 0 END) AS s_a,
         sum(CASE WHEN in_a AND value IS NOT NULL THEN v_fp * v_fp ELSE 0 END) AS ss_a,
         CAST(sum(CASE WHEN NOT in_a AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         sum(CASE WHEN NOT in_a AND value IS NOT NULL THEN v_fp ELSE 0 END) AS s_b,
         sum(CASE WHEN NOT in_a AND value IS NOT NULL THEN v_fp * v_fp ELSE 0 END) AS ss_b
  FROM fp GROUP BY event_type
), dbl AS (
  SELECT event_type, n_a, n_b,
         CAST(s_a AS DOUBLE) / 1000000.0 AS sa,
         CAST(s_b AS DOUBLE) / 1000000.0 AS sb,
         CAST(ss_a AS DOUBLE) / 1000000000000.0 AS ssa,
         CAST(ss_b AS DOUBLE) / 1000000000000.0 AS ssb
  FROM agg WHERE n_a >= 2 AND n_b >= 2
), stats AS (
  SELECT event_type, n_a, n_b,
         sa / n_a AS ma, sb / n_b AS mb,
         (ssa - sa * sa / n_a) / (n_a - 1) AS va,
         (ssb - sb * sb / n_b) / (n_b - 1) AS vb
  FROM dbl
)
SELECT event_type, n_a, n_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS welch_t
FROM stats WHERE va / n_a + vb / n_b > 0
ORDER BY event_type
"""


_BOOT_B = 64  # bootstrap replicates
_BOOT_MAX_W = 7  # Poisson(1) tail cap: P(w > 7) ≈ 1e-5 per draw


def _pois1_cum_hex() -> tuple:
    """Cumulative Poisson(1) thresholds as fixed-width lowercase hex —
    the weight of a (row, replicate) draw is the CASE-bucket its
    md5-uniform lands in, so both engines read the weight off the SAME
    exact string compares (the deterministic_keep convention extended
    from one threshold to the Poisson inverse-CDF ladder)."""
    import math

    acc, fact, out = 0.0, 1.0, []
    for k in range(_BOOT_MAX_W):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        out.append(format(int(acc * 16**6), "06x"))
    return tuple(out)


_POIS1_HEX = _pois1_cum_hex()


def _poisson_boot_ci(base: DataFrame, keys: list, salt_col, b_reps: int) -> DataFrame:
    """The Poisson-bootstrap CI chain shared by the event-type and
    per-nation (stratified) readouts — full-data point estimate,
    ×B replicate explode with the md5 inverse-CDF Poisson(1) ladder,
    and exact order-statistic bounds — parameterized by the grouping
    ``keys`` and the ladder ``salt_col`` (the stratified variant salts
    per stratum so strata draw independent resamples). One definition so
    the weight ladder, the degenerate rules and the rank arithmetic
    cannot drift between the two operators (the r10 factoring rule).

    ``base`` must carry: the key columns, event_id, in_a, ok, v_fp.

    v_fp is a LONG micro-unit fixed-point (r12 optimization): the
    replicate aggregate runs over 64× exploded rows, and DECIMAL(19,0)
    arithmetic measured ~1.8× slower than int64 on that path (noop-sink
    min-of-4 at sf0.1: replicate aggregate 7.0 s vs 3.9 s; whole
    operator 7.6 s vs 5.0 s — decimal multiply + decimal sum per row)
    for NO extra range (decimal(19) caps at 1e19 vs int64's 9.2e18;
    only the widened decimal SUM added headroom). Range bound, stated
    not hidden: |Σ w·v_fp| per (key, replicate, arm) needs < 2^63,
    i.e. with the w <= 7 tail cap about 1.3e12 of summed |value| mass
    per stratum — ~2.6e9 events per stratum at |value|~500. Past that,
    ANSI mode (on engine-wide) raises loudly rather than corrupting;
    the fallback is cast the PRODUCT to decimal(38,0) at the sum
    (measured 5.8 s — still faster than decimal-everywhere). DuckDB's
    HUGEINT oracle is unchanged — identical integers either way."""
    from pyspark.sql import Window

    pt = base.groupBy(*keys).agg(
        F.sum(F.when(F.col("in_a") & F.col("ok"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("in_a"), F.col("v_fp")).otherwise(F.lit(0))).alias("s_a"),
        F.sum(F.when(~F.col("in_a") & F.col("ok"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~F.col("in_a"), F.col("v_fp")).otherwise(F.lit(0))).alias("s_b"),
    )

    h = F.substring(
        F.md5(
            F.concat(
                salt_col,
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        ),
        1,
        6,
    )
    hc = F.col("_h")
    w = F.when(hc < F.lit(_POIS1_HEX[0]), 0)
    for k in range(1, _BOOT_MAX_W):
        w = w.when(hc < F.lit(_POIS1_HEX[k]), k)
    w = w.otherwise(F.lit(_BOOT_MAX_W))

    # Fan the ×B explode source across every core BEFORE the replicate
    # projection (r13 optimization, guide §2.2/§2.6): the ladder md5 over
    # B×N (row, replicate) draws is ~all of this operator's CPU, but the
    # pre-explode relation arrives narrow — a single-row-group parquet
    # scan is ONE partition, and a post-join exchange is AQE-coalesced on
    # its PRE-explode bytes — so without the fan-out the whole ladder runs
    # in one task. The round-robin exchange ships each narrow base row
    # once and is repaid B-fold in distributed hashing; defaultParallelism
    # = total cores = one wave for a CPU-bound stage. Row placement does
    # not affect results: every aggregate downstream is an exact-integer
    # sum (order-independent) keyed by (keys, b), never by partition.
    sc = base.sparkSession.sparkContext
    reps = (
        base.repartition(sc.defaultParallelism)
        .withColumn(
            "b", F.explode(F.sequence(F.lit(1), F.lit(int(b_reps))))
        )
        # hoist the ladder hash into a materialized column: ONE md5 per
        # (row, replicate) by construction, rather than trusting codegen
        # subexpression elimination across the 7 CASE branches
        .withColumn("_h", h)
        .withColumn("w", w)
        .drop("_h")
        .groupBy(*keys, "b")
        .agg(
            F.sum(
                F.when(F.col("in_a") & F.col("ok"), F.col("w")).otherwise(0)
            ).alias("rn_a"),
            F.sum(
                F.when(F.col("in_a"), F.col("w") * F.col("v_fp")).otherwise(
                    F.lit(0)
                )
            ).alias("rs_a"),
            F.sum(
                F.when(~F.col("in_a") & F.col("ok"), F.col("w")).otherwise(0)
            ).alias("rn_b"),
            F.sum(
                F.when(~F.col("in_a"), F.col("w") * F.col("v_fp")).otherwise(
                    F.lit(0)
                )
            ).alias("rs_b"),
        )
        .filter((F.col("rn_a") > 0) & (F.col("rn_b") > 0))
        .select(
            *keys,
            "b",
            (
                (F.col("rs_a").cast("double") / 1000000.0) / F.col("rn_a")
                - (F.col("rs_b").cast("double") / 1000000.0) / F.col("rn_b")
            ).alias("diff"),
        )
    )
    wnd = Window.partitionBy(*keys)
    ranked = reps.select(
        *keys,
        "diff",
        F.row_number().over(wnd.orderBy("diff", "b")).alias("r"),
        F.count(F.lit(1)).over(wnd).alias("n_reps"),
    )
    lo_rank = F.floor((F.lit(25) * F.col("n_reps") + 999) / 1000.0).cast("long")
    hi_rank = F.floor((F.lit(975) * F.col("n_reps") + 999) / 1000.0).cast("long")
    ci = ranked.groupBy(*keys).agg(
        F.max("n_reps").alias("n_reps"),
        F.min(F.when(F.col("r") == lo_rank, F.col("diff"))).alias("_lo"),
        F.min(F.when(F.col("r") == hi_rank, F.col("diff"))).alias("_hi"),
    )
    lo_r = F.round(F.col("_lo"), 6)
    hi_r = F.round(F.col("_hi"), 6)
    return (
        pt.filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
        .join(ci, keys)
        .select(
            *keys,
            "n_a",
            "n_b",
            F.round(
                (F.col("s_a").cast("double") / 1000000.0) / F.col("n_a")
                - (F.col("s_b").cast("double") / 1000000.0) / F.col("n_b"),
                6,
            ).alias("mean_diff"),
            lo_r.alias("ci_lo"),
            hi_r.alias("ci_hi"),
            "n_reps",
            ((lo_r > 0) | (hi_r < 0)).alias("significant"),
        )
    )


def ab_value_bootstrap_ci(
    spark: SparkSession, sf_dir: str, b_reps: int = _BOOT_B
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the A/B mean-value
    difference per event_type — the non-parametric companion to
    :func:`ab_value_ztest` (VERDICT r9 #7): where the z-test assumes
    the CLT kicked in, the bootstrap reads the 95% CI straight off the
    resampling distribution, which is what you want for skewed
    revenue-like metrics. Arms are the same md5-hash assignment as the
    z-test (salt ``ab1:``), so the two readouts describe the same
    experiment.

    The bootstrap is the Poisson approximation (each event's weight in
    replicate b is an independent Poisson(1) draw — the standard
    resampling scheme when the exact multinomial would need a global
    count): weights are DETERMINISTIC, md5(salt, event_id, b) mapped
    through the exact integer inverse-CDF ladder of
    :func:`_pois1_cum_hex`, so every engine, run, and partitioning
    draws the identical resample. The tail is capped at w=7 (P ≈ 1e-5
    per draw — a bias orders below the CI's own resolution, stated
    rather than hidden).

    Exactness rails: per-replicate arm sums are exact integers
    (micro-unit decimal values × integer weights, the ab_value_ztest
    fixed-point convention), each cast to double ONCE, so replicate
    diffs are bit-identical across engines; the CI bounds are exact
    order statistics — rank ceil(0.025·R) / ceil(0.975·R) computed as
    integer arithmetic floor((25R+999)/1000) — over (diff, b)-ordered
    replicates, never an interpolated percentile (the house
    approx_percentile rule: order statistics compare exactly,
    interpolations don't). Replicates where either arm draws total
    weight 0 are excluded and R counts survivors. Event types with
    fewer than 2 full-data events per arm are excluded (CI undefined
    — the z-test's degenerate rule).

    Scale shape: ONE events scan fans out ×B via explode, but map-side
    partial aggregation folds to |event_type|·B rows before the only
    exchange; the rank window then orders B-row partitions. B scales
    the scan's cpu (md5 per (row, replicate)), never the shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    in_a = F.substring(
        F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))), 1, 6
    ) < F.lit("800000")
    ok = F.col("value").isNotNull()
    v_fp = F.round(F.col("value") * 1000000.0, 0).cast("long")
    base = ev.select(
        "event_type",
        "event_id",
        in_a.alias("in_a"),
        ok.alias("ok"),
        F.when(ok, v_fp).otherwise(F.lit(0).cast("long")).alias("v_fp"),
    )

    return _poisson_boot_ci(
        base, ["event_type"], F.lit("abboot1:"), b_reps
    ).orderBy("event_type")


def _boot_ci_sql(base_cte: str, keys: list, salt_sql: str) -> str:
    """SQL mirror of :func:`_poisson_boot_ci`, parameterized the same way
    (grouping keys + ladder salt) so the oracle chain for every bootstrap
    readout is ONE definition: the Poisson CASE ladder, the replicate
    aggregation, and the integer rank arithmetic for the exact
    order-statistic bounds. ``base_cte`` must yield the key columns plus
    event_id, in_a, ok, v_fp (v_fp as HUGEINT micro-units)."""
    w_case = "CASE " + " ".join(
        f"WHEN h < '{t}' THEN {k}" for k, t in enumerate(_POIS1_HEX)
    ) + f" ELSE {_BOOT_MAX_W} END"
    k = ", ".join(keys)
    pk = ", ".join(f"p.{c}" for c in keys)
    join_on = " AND ".join(f"ci.{c} = p.{c}" for c in keys)
    return f"""
WITH base AS ({base_cte}), pt AS (
  SELECT {k},
         CAST(sum(CASE WHEN in_a AND ok THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         sum(CASE WHEN in_a THEN v_fp ELSE 0 END) AS s_a,
         CAST(sum(CASE WHEN NOT in_a AND ok THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         sum(CASE WHEN NOT in_a THEN v_fp ELSE 0 END) AS s_b
  FROM base GROUP BY {k}
), drawn AS (
  SELECT {k}, reps.b, in_a, ok, v_fp,
         substring(md5({salt_sql} || CAST(event_id AS VARCHAR) || ':'
                       || CAST(reps.b AS VARCHAR)), 1, 6) AS h
  FROM base
  CROSS JOIN (SELECT unnest(generate_series(1, {_BOOT_B})) AS b) reps
), weighted AS (
  SELECT {k}, b, in_a, ok, v_fp, {w_case} AS w FROM drawn
), rep_agg AS (
  SELECT {k}, b,
         CAST(sum(CASE WHEN in_a AND ok THEN w ELSE 0 END) AS BIGINT) AS rn_a,
         sum(CASE WHEN in_a THEN w * v_fp ELSE 0 END) AS rs_a,
         CAST(sum(CASE WHEN NOT in_a AND ok THEN w ELSE 0 END) AS BIGINT) AS rn_b,
         sum(CASE WHEN NOT in_a THEN w * v_fp ELSE 0 END) AS rs_b
  FROM weighted GROUP BY {k}, b
), diffs AS (
  SELECT {k}, b,
         (CAST(rs_a AS DOUBLE) / 1000000.0) / rn_a
           - (CAST(rs_b AS DOUBLE) / 1000000.0) / rn_b AS diff
  FROM rep_agg WHERE rn_a > 0 AND rn_b > 0
), ranked AS (
  SELECT {k}, diff,
         row_number() OVER (PARTITION BY {k} ORDER BY diff, b) AS r,
         count(*) OVER (PARTITION BY {k}) AS n_reps
  FROM diffs
), ci AS (
  SELECT {k},
         CAST(max(n_reps) AS BIGINT) AS n_reps,
         min(CASE WHEN r = CAST(floor((25 * n_reps + 999) / 1000.0) AS BIGINT)
                  THEN diff END) AS lo,
         min(CASE WHEN r = CAST(floor((975 * n_reps + 999) / 1000.0) AS BIGINT)
                  THEN diff END) AS hi
  FROM ranked GROUP BY {k}
)
SELECT {pk}, p.n_a, p.n_b,
       round((CAST(p.s_a AS DOUBLE) / 1000000.0) / p.n_a
             - (CAST(p.s_b AS DOUBLE) / 1000000.0) / p.n_b, 6) AS mean_diff,
       round(ci.lo, 6) AS ci_lo,
       round(ci.hi, 6) AS ci_hi,
       ci.n_reps,
       (round(ci.lo, 6) > 0 OR round(ci.hi, 6) < 0) AS significant
FROM pt p JOIN ci ON {join_on}
WHERE p.n_a >= 2 AND p.n_b >= 2
ORDER BY {pk}
"""


_AB_BASE_CTE = """
  SELECT event_type, event_id,
         substring(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 6) < '800000'
           AS in_a,
         value IS NOT NULL AS ok,
         CASE WHEN value IS NOT NULL
              THEN CAST(round(value * 1000000.0, 0) AS HUGEINT)
              ELSE 0 END AS v_fp
  FROM events
"""

AB_BOOTSTRAP_SQL = _boot_ci_sql(_AB_BASE_CTE, ["event_type"], "'abboot1:'")


def ab_value_bootstrap_ci_by_nation(
    spark: SparkSession, sf_dir: str, b_reps: int = _BOOT_B
) -> DataFrame:
    """Stratified (per-nation) Poisson-bootstrap CI for the A/B
    mean-value difference — the heterogeneous-treatment-effect readout
    of :func:`ab_value_bootstrap_ci` (VERDICT r10 #5): arms are the SAME
    md5 assignment (salt ``ab1:``) so every readout describes the same
    experiment, but events are stratified by the user's nation
    (events.user_id → customer → nation) and each stratum gets its own
    resampling distribution and exact order-statistic bounds. A nation
    whose CI excludes 0 while the pooled CI straddles it is exactly the
    effect heterogeneity a pooled readout averages away.

    The Poisson ladder salts PER STRATUM (``abstrat1:<n_name>:``), so
    strata draw independent resamples — replicate b in one nation shares
    no randomness with replicate b in another (a shared salt would
    correlate the per-stratum CIs through common draws on shared event
    positions; per-stratum salting is the stratified-bootstrap
    convention and makes each stratum's distribution exactly what a
    standalone bootstrap on that stratum would produce).

    Exactness rails: identical to the pooled operator by construction —
    both run the ONE :func:`_poisson_boot_ci` / :func:`_boot_ci_sql`
    chain (integer micro-unit sums cast to double once, exact
    order-statistic ranks floor((25R+999)/1000), degenerate strata with
    <2 full-data events per arm excluded).

    Scale shape: nation (25 rows at any SF) broadcasts onto customer;
    the events⋈customer equi-join on user_id is left to Catalyst/AQE
    (customer is NOT force-broadcast — it scales with SF and would blow
    the broadcast limit at cluster scale; a shuffle join is the honest
    plan there). Then ONE scan fans out ×B with map-side partial
    aggregation folding to |nations|·B rows before the only exchange;
    the rank windows order B-row partitions per stratum."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    dim = cust.join(F.broadcast(nat), "c_nationkey")
    in_a = F.substring(
        F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))), 1, 6
    ) < F.lit("800000")
    ok = F.col("value").isNotNull()
    v_fp = F.round(F.col("value") * 1000000.0, 0).cast("long")
    base = ev.join(dim, "user_id").select(
        "n_name",
        "event_id",
        in_a.alias("in_a"),
        ok.alias("ok"),
        F.when(ok, v_fp).otherwise(F.lit(0).cast("long")).alias("v_fp"),
    )
    salt = F.concat(
        F.lit("abstrat1:"), F.col("n_name").cast("string"), F.lit(":")
    )
    return _poisson_boot_ci(base, ["n_name"], salt, b_reps).orderBy("n_name")


_STRAT_BASE_CTE = """
  SELECT n.n_name, e.event_id,
         substring(md5('ab1:' || CAST(e.user_id AS VARCHAR)), 1, 6) < '800000'
           AS in_a,
         e.value IS NOT NULL AS ok,
         CASE WHEN e.value IS NOT NULL
              THEN CAST(round(e.value * 1000000.0, 0) AS HUGEINT)
              ELSE 0 END AS v_fp
  FROM events e
  JOIN customer c ON c.c_custkey = e.user_id
  JOIN nation n ON n.n_nationkey = c.c_nationkey
"""

STRATIFIED_BOOTSTRAP_SQL = _boot_ci_sql(
    _STRAT_BASE_CTE,
    ["n_name"],
    "'abstrat1:' || CAST(n_name AS VARCHAR) || ':'",
)


def ab_purchase_rate_bootstrap_ci(
    spark: SparkSession, sf_dir: str, b_reps: int = _BOOT_B
) -> DataFrame:
    """Poisson-bootstrap CI for the A/B difference in PURCHASE RATE — the
    rate-metric member of the bootstrap family (the most common A/B
    readout is a conversion proportion, not a mean value): the metric is
    the indicator `event_type = 'purchase'`, so the
    :func:`_poisson_boot_ci` chain's per-replicate arm mean IS the
    resampled purchase rate and ``mean_diff`` reads as the rate
    difference (rate_a − rate_b). Arms are the same md5 ``ab1:``
    assignment as every other readout of this experiment; the ladder
    salt is ``abrate1:`` so the rate CI draws resamples independent of
    the value CI's.

    A normal-approximation CI on a proportion misbehaves exactly where
    experiments get decided (rates near 0 or 1, thin arms); the
    bootstrap's exact order-statistic bounds don't.

    Exactness rails: inherited verbatim from the ONE parameterized
    chain — the indicator is a micro-unit integer (0 or 1,000,000), so
    every replicate arm sum stays an exact integer; bounds are exact
    order statistics at integer-computed ranks.

    Scale shape: identical to the pooled value CI — ONE events scan
    fans out ×B, map-side partials fold to B rows (single constant key)
    before the only exchange."""
    ev = load_table(spark, sf_dir, "events")
    in_a = F.substring(
        F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))), 1, 6
    ) < F.lit("800000")
    hit = (F.col("event_type") == "purchase").cast("long")
    base = ev.select(
        F.lit("purchase_rate").alias("metric"),
        "event_id",
        in_a.alias("in_a"),
        F.lit(True).alias("ok"),
        (hit * F.lit(1000000)).cast("long").alias("v_fp"),
    )
    return _poisson_boot_ci(base, ["metric"], F.lit("abrate1:"), b_reps).orderBy(
        "metric"
    )


_RATE_BASE_CTE = """
  SELECT 'purchase_rate' AS metric, event_id,
         substring(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 6) < '800000'
           AS in_a,
         TRUE AS ok,
         CAST(CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END
              AS HUGEINT) AS v_fp
  FROM events
"""

RATE_BOOTSTRAP_SQL = _boot_ci_sql(_RATE_BASE_CTE, ["metric"], "'abrate1:'")


def _corr_sums(x, y) -> list:
    """The five exact decimal accumulators of a Pearson correlation
    (Σx, Σy, Σxy, Σx², Σy²) over pre-fixed-pointed integer columns —
    shared by the Pearson and Spearman (ranks) operators so the
    certified exactness rules live in ONE place."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    ]


def _corr_column():
    """Correlation from the :func:`_corr_sums` accumulators: each exact
    integer sum cast to double ONCE, combined in a fixed op order, NULL
    on zero variance (the degenerate-input rule). Scale-invariant, so
    fixed-point scaling factors cancel."""
    n = F.col("n_rows").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    return F.when((dx > 0) & (dy > 0), (n * sxy - sx * sy) / F.sqrt(dx * dy))


def corr_price_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between extended price and quantity per
    returnflag — the feature-relationship scan a profiling pass runs over
    numeric column pairs before modeling (and the builtin ``corr`` is a
    float accumulator whose update order is not contractual, so this uses
    the engine-wide explicit-sums rule instead).

    Exactness: both columns are fixed-pointed at cents (2 dp covers the
    money column exactly and the integral quantities trivially), and all
    five accumulators (Σx, Σy, Σxy, Σx², Σy²) are exact decimal integer
    sums — order-independent, engine-portable. Correlation is scale
    invariant, so r is computed directly on the cent-scaled integers:
    each exact sum is cast to double ONCE and combined in a fixed op
    order on both engines. Zero-variance groups yield NULL (guard > 0,
    the degenerate-input rule).

    Scale shape: ONE scan, one hash aggregate per group carrying seven
    numbers — the textbook map-side-combinable correlation."""
    li = load_table(spark, sf_dir, "lineitem")
    xc = F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(19,0)")
    yc = F.round(F.col("l_quantity") * 100, 0).cast("decimal(19,0)")
    agg = li.groupBy("l_returnflag").agg(*_corr_sums(xc, yc))
    return agg.select(
        "l_returnflag", "n_rows", F.round(_corr_column(), 6).alias("pearson_r")
    ).orderBy("l_returnflag")


CORR_SQL = """
WITH agg AS (
  SELECT l_returnflag, count(*) AS n_rows,
         sum(CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS sx,
         sum(CAST(round(l_quantity * 100, 0) AS HUGEINT)) AS sy,
         sum(CAST(round(l_extendedprice * 100, 0) AS HUGEINT)
             * CAST(round(l_quantity * 100, 0) AS HUGEINT)) AS sxy,
         sum(CAST(round(l_extendedprice * 100, 0) AS HUGEINT)
             * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS sxx,
         sum(CAST(round(l_quantity * 100, 0) AS HUGEINT)
             * CAST(round(l_quantity * 100, 0) AS HUGEINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
), dbl AS (
  SELECT l_returnflag, n_rows,
         CAST(n_rows AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
         CAST(sy AS DOUBLE) AS sy, CAST(sxy AS DOUBLE) AS sxy,
         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy
  FROM agg
)
SELECT l_returnflag, n_rows,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         round((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS pearson_r
FROM dbl
ORDER BY l_returnflag
"""


def spearman_quantity_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and discount per
    returnflag — the monotonic-relationship scan that is robust to the
    heavy ties and non-normal shapes raw Pearson chokes on (discount has
    a handful of distinct values, the worst case for naive ranking).

    Ties take AVERAGE ranks (the textbook Spearman), computed portably as
    min-rank + (tie-class size − 1)/2; doubling makes every average rank
    an INTEGER, so the Pearson-on-ranks accumulators are exact decimal
    integer sums and correlation's scale invariance erases the doubling.

    NULL policy: rows with a NULL in EITHER column are excluded before
    ranking (pairwise-complete, the statistics-package default) — it
    also removes the engine divergence where Spark ranks NULLS FIRST
    and DuckDB NULLS LAST, which would shift every rank by the NULL
    count.

    Scale shape: two rank windows sort WITHIN each returnflag partition
    (one hash shuffle, no global sort — the inherent cost of exact
    Spearman; at petabyte scale swap ranks for approx_percentile-binned
    grades), then the same one-pass sums as the Pearson profile."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount")
        .filter(
            F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull()
        )
    )

    def rank2(col: str) -> F.Column:
        w = Window.partitionBy("l_returnflag").orderBy(F.asc(col))
        tie = Window.partitionBy("l_returnflag", col)
        return (2 * F.rank().over(w) + F.count(F.lit(1)).over(tie) - 1).cast(
            "decimal(19,0)"
        )

    from pyspark.sql import Window

    ranked = li.select(
        "l_returnflag", rank2("l_quantity").alias("rx"), rank2("l_discount").alias("ry")
    )
    agg = ranked.groupBy("l_returnflag").agg(
        *_corr_sums(F.col("rx"), F.col("ry"))
    )
    return agg.select(
        "l_returnflag", "n_rows", F.round(_corr_column(), 6).alias("spearman_rho")
    ).orderBy("l_returnflag")


SPEARMAN_SQL = """
WITH complete AS (
  SELECT l_returnflag, l_quantity, l_discount FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
), ranked AS (
  SELECT l_returnflag,
         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx,
         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_discount)
           + count(*) OVER (PARTITION BY l_returnflag, l_discount) - 1 AS ry
  FROM complete
), agg AS (
  SELECT l_returnflag, count(*) AS n_rows,
         sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
         sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
         sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
         sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy
  FROM ranked GROUP BY l_returnflag
), dbl AS (
  SELECT l_returnflag, n_rows,
         CAST(n_rows AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
         CAST(sy AS DOUBLE) AS sy, CAST(sxy AS DOUBLE) AS sxy,
         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy
  FROM agg
)
SELECT l_returnflag, n_rows,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         round((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS spearman_rho
FROM dbl
ORDER BY l_returnflag
"""


def chi2_event_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence scan of event_type × day-of-week: observed
    cell counts vs the marginal-product expectation — the categorical
    drift tripwire that catches "errors spike on Mondays" shapes a
    per-column profile misses.

    Exactness: O, row/column/grand totals are integer counts; E and each
    cell's (O−E)²/E are doubles from identical integer operands in a
    fixed op order. The chi2_total column sums the 6 dp-ROUNDED cell
    contributions as exact fixed-point integers, so the cross-cell sum
    is order-independent on both engines. ZERO cells are materialized
    (observed-types × observed-dows grid, left-joined counts): a fully
    separated contingency drops half its cells from a naive groupBy and
    silently understates chi² — caught by the wave's property test.

    Scale shape: ONE fact scan to |types|×7 observed cells; both
    marginals re-aggregate the CELL table (vocabulary-sized, the
    unigram-KL convention — facts are never re-read), and the grid
    crossJoin multiplies the two tiny marginal frames."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("n_obs"))
    types = cells.groupBy("event_type").agg(F.sum("n_obs").alias("_row_total"))
    dows = cells.groupBy("dow").agg(F.sum("n_obs").alias("_col_total"))
    grid = (
        types.crossJoin(dows)
        .join(cells, ["event_type", "dow"], "left")
        .select(
            "event_type", "dow", "_row_total", "_col_total",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        )
    )
    grand = F.sum("n_obs").over(Window.partitionBy())
    expected = (
        F.col("_row_total").cast("double")
        * F.col("_col_total").cast("double")
        / grand.cast("double")
    )
    contrib = F.round(
        (F.col("n_obs").cast("double") - expected) ** 2 / expected, 6
    )
    with_c = grid.select(
        "event_type", "dow", "n_obs",
        F.round(expected, 4).alias("expected"),
        contrib.alias("chi2_contrib"),
    )
    total = (
        F.sum(F.round(F.col("chi2_contrib") * 1000000, 0).cast("long")).over(
            Window.partitionBy()
        )
        / 1000000.0
    )
    return with_c.select(
        "event_type", "dow", "n_obs", "expected", "chi2_contrib",
        F.round(total, 6).alias("chi2_total"),
    ).orderBy("event_type", "dow")


CHI2_SQL = """
WITH base AS (
  SELECT event_type, dayofweek(CAST(ts AS DATE)) + 1 AS dow FROM events
), cells AS (
  SELECT event_type, dow, count(*) AS n_obs FROM base GROUP BY 1, 2
), types AS (
  SELECT event_type, sum(n_obs) AS row_total FROM cells GROUP BY 1
), dows AS (
  SELECT dow, sum(n_obs) AS col_total FROM cells GROUP BY 1
), grid AS (
  SELECT t.event_type, d.dow, t.row_total, d.col_total,
         coalesce(c.n_obs, 0) AS n_obs
  FROM types t CROSS JOIN dows d
  LEFT JOIN cells c ON c.event_type = t.event_type AND c.dow = d.dow
), e AS (
  SELECT event_type, dow, n_obs,
         CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)
           / CAST(sum(n_obs) OVER () AS DOUBLE) AS expected
  FROM grid
), c AS (
  SELECT event_type, dow, n_obs, expected,
         round(pow(CAST(n_obs AS DOUBLE) - expected, 2) / expected, 6)
           AS chi2_contrib
  FROM e
)
SELECT event_type, dow, n_obs, round(expected, 4) AS expected, chi2_contrib,
       round(sum(CAST(round(chi2_contrib * 1000000, 0) AS BIGINT)) OVER ()
             / 1000000.0, 6) AS chi2_total
FROM c
ORDER BY event_type, dow
"""


def mad_outlier_orders(
    spark: SparkSession, sf_dir: str, z_cut: float = 3.5
) -> DataFrame:
    """Median-absolute-deviation outlier report per priority class — the
    robust companion to ``outlier_orders_by_zscore``: a few extreme rows
    inflate the classical stddev and hide themselves (|z| is bounded by
    (n−1)/√n), while the MAD-based robust z-score
    0.6745·(x − median)/MAD keeps flagging them.

    Exactness: both medians ride the portable exact-percentile pair
    (Spark ``percentile`` == DuckDB ``quantile_cont``) and are rounded
    to 6 dp at the broadcast boundary, so both engines compute
    deviations from identical constants; the robust z is rounded to
    6 dp BEFORE the cut (the boundary rule). Zero-MAD classes yield
    NULL / 0 outliers.

    Scale shape: three scans (the inherent cost of a median OF
    deviations FROM a median) with the per-class constants broadcast
    between them — never a fact-side join shuffle; at petabyte scale
    swap the exact percentiles for approx_percentile."""
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    return mad_report(
        o, "o_orderpriority", "o_totalprice",
        z_cut=z_cut, median_name="median_price", n_name="n_orders",
    )


def mad_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_cut: float = 3.5,
    median_name: str = "median_value",
    n_name: str = "n_rows",
) -> DataFrame:
    """The shared 3-pass MAD machinery (median → median-of-deviations →
    robust-z count) behind mad_outlier_orders and n2_norm_outliers: the
    0.6745 consistency constant, the 6 dp round-before-cut rule, and
    the zero-MAD NULL policy live HERE once, so a change cannot skew
    one certified operator and not the other."""
    g, v = F.col(group_col), F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias("med"),
        F.count(F.lit(1)).alias("_n"),
    )
    devs = df.join(F.broadcast(med), group_col).select(
        g, "med", "_n", F.abs(v - F.col("med")).alias("dev")
    )
    mad = devs.groupBy(group_col).agg(
        F.first("med").alias("med"),
        F.first("_n").alias("_n"),
        F.round(F.expr("percentile(dev, 0.5)"), 6).alias("mad"),
    )
    rz = F.when(
        F.col("mad") > 0,
        F.round(F.lit(0.6745) * F.abs(v - F.col("med")) / F.col("mad"), 6),
    )
    return (
        df.join(F.broadcast(mad), group_col)
        .select(g, "med", "mad", "_n", rz.alias("rz"))
        .groupBy(group_col)
        .agg(
            F.first("_n").alias(n_name),
            F.first("med").alias(median_name),
            F.first("mad").alias("mad"),
            F.sum(F.when(F.col("rz") > z_cut, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max("rz"), 3).alias("max_robust_z"),
        )
        .orderBy(group_col)
    )


MAD_OUTLIER_SQL = """
WITH med AS (
  SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5), 6) AS med,
         count(*) AS n_orders
  FROM orders GROUP BY 1
), mad AS (
  SELECT o.o_orderpriority, min(m.med) AS med, min(m.n_orders) AS n_orders,
         round(quantile_cont(abs(o.o_totalprice - m.med), 0.5), 6) AS mad
  FROM orders o JOIN med m USING (o_orderpriority)
  GROUP BY 1
), rz AS (
  SELECT o.o_orderpriority, m.med, m.mad, m.n_orders,
         CASE WHEN m.mad > 0 THEN
           round(0.6745 * abs(o.o_totalprice - m.med) / m.mad, 6)
         END AS rz
  FROM orders o JOIN mad m USING (o_orderpriority)
)
SELECT o_orderpriority,
       CAST(min(n_orders) AS BIGINT) AS n_orders,
       min(med) AS median_price,
       min(mad) AS mad,
       CAST(sum(CASE WHEN rz > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(rz), 3) AS max_robust_z
FROM rz
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def order_value_decile_lift(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """Customer revenue decile table (the Lorenz-curve companion to the
    Gini operator): customers ranked by exact total spend, cut into
    ntile deciles, each reporting its revenue share and the cumulative
    share — the "top 10% of customers carry X% of revenue" report every
    growth review opens with.

    Exactness (``exact=True``, the oracle-certified default): spend is
    exact integer cents; shares and the cumulative share are single
    divisions of exact integer window sums, rounded to 6 dp; the decile
    cut is ntile over a TOTAL order (spend desc, custkey asc),
    identical on both engines including the remainder-to-front
    bucket-size rule.

    Scale shape: facts fold to one row per customer (map-side partial
    cent sums). The exact ntile window totally orders the CUSTOMER
    table — key-cardinality, but still a single-partition sort of
    |customers| rows. ``exact=False`` is the 100 TB path: decile
    BOUNDARIES come from one approx_percentile sketch row (broadcast —
    no sort anywhere), and each customer maps to its decile by
    comparing spend against the 9 boundaries in-row. Bucket sizes then
    wobble by sketch rank error and boundary ties instead of being
    exactly-n/10 (shares move by the boundary-straddling customers'
    revenue — the wave-7 test bounds the cum-share gap at sf0.01
    under 0.02); the SQL oracle covers the exact default only (the
    edit-distance convention)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("_cents")
    )
    if exact:
        w = Window.orderBy(F.desc("_cents"), F.asc("o_custkey"))
        deciled = per_cust.select(
            "_cents", F.ntile(10).over(w).alias("decile")
        )
    else:
        probs = F.array(*[F.lit(i / 10.0) for i in range(9, 0, -1)])
        bounds = per_cust.agg(
            F.approx_percentile(F.col("_cents"), probs, F.lit(10_000)).alias("_b")
        )
        # decile = 1 + number of boundaries the spend fails to reach:
        # spend >= b[0] (the p90 cut) -> decile 1 ... below all 9 -> 10
        decile = (
            F.lit(1)
            + F.size(
                F.filter(F.col("_b"), lambda b: F.col("_cents") < b)
            )
        ).cast("int")
        deciled = per_cust.join(F.broadcast(bounds)).select(
            "_cents", decile.alias("decile")
        )
    per_dec = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("_cents").alias("_dec_cents"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("_dec_cents").over(w_all)
    cum = F.sum("_dec_cents").over(w_cum)
    return per_dec.select(
        "decile",
        "n_customers",
        F.round(F.col("_dec_cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("_dec_cents").cast("double") / total, 6).alias(
            "revenue_share"
        ),
        F.round(cum.cast("double") / total, 6).alias("cum_share"),
    ).orderBy("decile")


DECILE_LIFT_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), deciled AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
  FROM per_cust
), per_dec AS (
  SELECT decile, count(*) AS n_customers, sum(cents) AS dec_cents
  FROM deciled GROUP BY 1
)
SELECT decile, n_customers,
       round(dec_cents / 100.0, 2) AS revenue,
       round(CAST(dec_cents AS DOUBLE) / sum(dec_cents) OVER (), 6)
         AS revenue_share,
       round(CAST(sum(dec_cents) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / sum(dec_cents) OVER (), 6) AS cum_share
FROM per_dec
ORDER BY decile
"""


def value_drift_psi(spark: SparkSession, sf_dir: str, n_bins: int = 20) -> DataFrame:
    """Population-stability index (PSI) of the event ``value``
    distribution between the corpus's early and late time halves, per
    event type — the monitoring-standard drift score (<0.1 stable,
    0.1–0.25 moderate shift, >0.25 investigate) computed over the data's
    own timeline, so a silent upstream change shows up without needing a
    second snapshot to diff against.

    Deterministic end to end: the time split is the integer-microsecond
    midpoint of (min ts, max ts); bins are equi-width over the global
    value min/max with the histogram operator's degenerate and last-bin
    clamps; empty-bin shares are floored at 1e-6 on BOTH engines (the
    standard PSI smoothing — an unguarded empty bin is ±∞); per-bin
    terms are 9 dp fixed-point-summed. Both stats frames are 1-row
    broadcasts (the allowlisted scalar shape).

    Scale shape: two scans (bounds+midpoint, then the binned count
    aggregate) and window arithmetic over |types|×bins cells."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    stats = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        # ADVICE r7: integer floor division on BOTH engines — `/ 2` here
        # is a double divide whose cast('long') TRUNCATES while the
        # oracle's CAST(... AS BIGINT) ROUNDS, so an odd min+max put the
        # engines' midpoints 1 us apart and a boundary event flipped
        # early/late.  `div` stays in int64 (no 2^53 double precision
        # cliff either); the oracle mirrors with `// 2`.
        F.expr(
            "(min(timestampdiff(MICROSECOND, timestamp'1970-01-01', ts))"
            " + max(timestampdiff(MICROSECOND, timestamp'1970-01-01', ts)))"
            " div 2"
        ).alias("mid_micros"),
    )
    width = (F.col("hi") - F.col("lo")) / n_bins
    bin_id = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width), F.lit(n_bins - 1)
            )
        )
        .cast("int")
    )
    is_late = (
        F.expr("timestampdiff(MICROSECOND, timestamp'1970-01-01', ts)")
        > F.col("mid_micros")
    )
    cells = (
        ev.join(F.broadcast(stats))
        .select("event_type", bin_id.alias("bin"), is_late.alias("late"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("late"), 0).otherwise(1)).alias("n_early"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late"),
        )
    )
    w_t = Window.partitionBy("event_type")
    pe = F.greatest(
        F.col("n_early").cast("double") / F.sum("n_early").over(w_t),
        F.lit(1e-6),
    )
    pl = F.greatest(
        F.col("n_late").cast("double") / F.sum("n_late").over(w_t),
        F.lit(1e-6),
    )
    term_fp = F.round((pl - pe) * F.log(pl / pe) * 1000000000, 0).cast("long")
    return (
        cells.select(
            "event_type",
            F.col("n_early").alias("n"),
            F.col("n_late").alias("m"),
            term_fp.alias("_t"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_early"),
            F.sum("m").alias("n_late"),
            F.round(F.sum("_t") / 1000000000.0, 6).alias("psi"),
        )
        .orderBy("event_type")
    )


VALUE_DRIFT_PSI_SQL = """
WITH stats AS (
  SELECT min(value) AS lo, max(value) AS hi,
         (min(date_diff('microsecond', TIMESTAMP '1970-01-01', ts))
          + max(date_diff('microsecond', TIMESTAMP '1970-01-01', ts)))
         // 2 AS mid_micros
  FROM events
), binned AS (
  SELECT event_type,
         CAST(CASE WHEN hi = lo THEN 0
              ELSE least(floor((value - lo) / ((hi - lo) / 20)), 19)
              END AS INTEGER) AS bin,
         date_diff('microsecond', TIMESTAMP '1970-01-01', ts) > mid_micros
           AS late
  FROM events CROSS JOIN stats
), cells AS (
  SELECT event_type, bin,
         sum(CASE WHEN late THEN 0 ELSE 1 END) AS n_early,
         sum(CASE WHEN late THEN 1 ELSE 0 END) AS n_late
  FROM binned GROUP BY 1, 2
), terms AS (
  SELECT event_type, n_early, n_late,
         CAST(round(
           (greatest(CAST(n_late AS DOUBLE)
                     / sum(n_late) OVER (PARTITION BY event_type), 1e-6)
            - greatest(CAST(n_early AS DOUBLE)
                       / sum(n_early) OVER (PARTITION BY event_type), 1e-6))
           * ln(greatest(CAST(n_late AS DOUBLE)
                         / sum(n_late) OVER (PARTITION BY event_type), 1e-6)
                / greatest(CAST(n_early AS DOUBLE)
                           / sum(n_early) OVER (PARTITION BY event_type), 1e-6))
           * 1000000000, 0) AS BIGINT) AS t
  FROM cells
)
SELECT event_type,
       CAST(sum(n_early) AS BIGINT) AS n_early,
       CAST(sum(n_late) AS BIGINT) AS n_late,
       round(sum(t) / 1000000000.0, 6) AS psi
FROM terms GROUP BY event_type
ORDER BY event_type
"""


# default shared with LENGTH_PSI_SQL below (the derived-constant
# convention: the Python default and the certified SQL cannot diverge)
_PSI_N_BINS = 20


def n3_length_psi_by_source(
    spark: SparkSession, sf_dir: str, n_bins: int = _PSI_N_BINS
) -> DataFrame:
    """Population-stability index of each SOURCE's document-length
    (n_chars) distribution against the whole corpus — the per-source
    drift score a multi-source ingest dashboard ranks by (a source whose
    length profile suddenly diverges from the corpus is the first place
    to look for a scraper change, truncation bug, or boilerplate flood).
    Same PSI scale as :func:`value_drift_psi` (<0.1 stable, >0.25
    investigate).

    Deterministic end to end, the PSI house conventions: equi-width bins
    over the GLOBAL n_chars min/max with the degenerate and last-bin
    clamps; empty-bin shares floored at 1e-6 on both engines; per-bin
    terms 9 dp fixed-point-summed. Integer bin arithmetic — n_chars is
    exact int64, so bin edges are the only doubles and both engines
    floor the same quotients. The FULL |sources|×n_bins grid is
    materialized before the terms (the zero-cell-grid convention): a
    bin the source is absent from but the corpus occupies contributes
    its floored (1e-6 vs p_corp) term — dropping those cells is
    precisely the understatement that hides a drifted source (r9
    review finding, numerically reproduced: a fully-shifted source read
    0.73 where the correct PSI is 9.2).

    Scale shape: one bounds aggregate (1-row broadcast, the allowlisted
    scalar shape) + one (source × bin) hash aggregate; the zero-cell
    grid is |sources|·n_bins rows (control-plane-sized) and corpus bin
    counts are a window RE-aggregate of it — the corpus is never
    scanned twice."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    stats = docs.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    width = (F.col("hi") - F.col("lo")).cast("double") / n_bins
    bin_id = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("n_chars") - F.col("lo")).cast("double") / width),
                F.lit(n_bins - 1),
            )
        )
        .cast("int")
    )
    cells = (
        docs.join(F.broadcast(stats))
        .select("source", bin_id.alias("bin"))
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n_sb"))
    )
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    grid = cells.select("source").distinct().crossJoin(F.broadcast(bins))
    cells = grid.join(cells, ["source", "bin"], "left").select(
        "source", "bin", F.coalesce("n_sb", F.lit(0).cast("long")).alias("n_sb")
    )
    w_src = Window.partitionBy("source")
    w_bin = Window.partitionBy("bin")
    w_all = Window.partitionBy()
    p_src = F.greatest(
        F.col("n_sb").cast("double") / F.sum("n_sb").over(w_src), F.lit(1e-6)
    )
    p_corp = F.greatest(
        F.sum("n_sb").over(w_bin).cast("double") / F.sum("n_sb").over(w_all),
        F.lit(1e-6),
    )
    term_fp = F.round(
        (p_src - p_corp) * F.log(p_src / p_corp) * 1000000000, 0
    ).cast("long")
    return (
        cells.select("source", F.col("n_sb").alias("n"), term_fp.alias("_t"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.round(F.sum("_t") / 1000000000.0, 6).alias("psi"),
        )
        .orderBy("source")
    )


LENGTH_PSI_SQL = f"""
WITH stats AS (
  SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents
), binned AS (
  SELECT source,
         CAST(CASE WHEN hi = lo THEN 0
              ELSE least(floor(CAST(n_chars - lo AS DOUBLE)
                               / (CAST(hi - lo AS DOUBLE) / {_PSI_N_BINS})),
                         {_PSI_N_BINS - 1})
              END AS INTEGER) AS bin
  FROM documents CROSS JOIN stats
), raw_cells AS (
  SELECT source, bin, count(*) AS n_sb FROM binned GROUP BY 1, 2
), grid AS (
  SELECT s.source, CAST(b.bin AS INTEGER) AS bin
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN (SELECT unnest(generate_series(0, {_PSI_N_BINS - 1})) AS bin) b
), cells AS (
  SELECT g.source, g.bin, COALESCE(r.n_sb, 0) AS n_sb
  FROM grid g LEFT JOIN raw_cells r ON g.source = r.source AND g.bin = r.bin
), terms AS (
  SELECT source, n_sb,
         CAST(round(
           (greatest(CAST(n_sb AS DOUBLE)
                     / sum(n_sb) OVER (PARTITION BY source), 1e-6)
            - greatest(CAST(sum(n_sb) OVER (PARTITION BY bin) AS DOUBLE)
                       / sum(n_sb) OVER (), 1e-6))
           * ln(greatest(CAST(n_sb AS DOUBLE)
                         / sum(n_sb) OVER (PARTITION BY source), 1e-6)
                / greatest(CAST(sum(n_sb) OVER (PARTITION BY bin) AS DOUBLE)
                           / sum(n_sb) OVER (), 1e-6))
           * 1000000000, 0) AS BIGINT) AS t
  FROM cells
)
SELECT source,
       CAST(sum(n_sb) AS BIGINT) AS n_docs,
       round(CAST(sum(t) AS BIGINT) / 1000000000.0, 6) AS psi
FROM terms
GROUP BY source
ORDER BY source
"""


def priority_mix_drift_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of each calendar month's order-PRIORITY mix against the
    corpus-lifetime mix — the categorical drift monitor for a workload's
    composition (a month where urgent orders spike shows as a PSI spike
    long before anyone reads the raw mix table). The categorical sibling
    of :func:`n3_length_psi_by_source` with months as the monitored
    slices and priorities as the cells, read on the standard PSI scale
    (<0.1 stable, 0.1-0.25 moderate, >0.25 investigate).

    The (month × priority) grid is materialized COMPLETE before any
    share forms (zero-cell rule: a priority absent in a month is exactly
    the drift signal PSI must see, and a groupBy would drop it); months
    are engine-free integers year·100+month (yyyymm — never
    date_trunc('month'), whose return type differs across engines).

    Exactness: counts exact int64; shares floored at 1e-6 (the PSI
    smoothing convention); per-cell terms 9 dp fixed-point-summed so
    both engines add identical integers (the value_drift_psi rail).

    Scale shape: one orders scan → (month, priority) hash aggregate;
    the grid crossJoin multiplies two TINY distinct frames (months ×
    |priorities|) and every window runs over grid-sized cells."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
            "order_month"
        ),
        "o_orderpriority",
    )
    cells = o.groupBy("order_month", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = cells.select("order_month").distinct().crossJoin(
        F.broadcast(cells.select("o_orderpriority").distinct())
    )
    g = grid.join(cells, ["order_month", "o_orderpriority"], "left").select(
        "order_month",
        "o_orderpriority",
        F.coalesce("n", F.lit(0).cast("long")).alias("n"),
    )
    w_m = Window.partitionBy("order_month")
    w_p = Window.partitionBy("o_orderpriority")
    w_all = Window.partitionBy()
    q = F.greatest(
        F.col("n").cast("double") / F.sum("n").over(w_m), F.lit(1e-6)
    )
    p = F.greatest(
        F.sum("n").over(w_p).cast("double") / F.sum("n").over(w_all),
        F.lit(1e-6),
    )
    term_fp = F.round((q - p) * F.log(q / p) * 1000000000, 0).cast("long")
    return (
        g.select("order_month", "n", term_fp.alias("_t"))
        .groupBy("order_month")
        .agg(
            F.sum("n").alias("n_orders"),
            F.round(F.sum("_t") / 1000000000.0, 6).alias("psi"),
        )
        .orderBy("order_month")
    )


PRIORITY_MIX_DRIFT_SQL = """
WITH o AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS order_month,
         o_orderpriority
  FROM orders
), cells AS (
  SELECT order_month, o_orderpriority, count(*) AS n FROM o GROUP BY 1, 2
), grid AS (
  SELECT m.order_month, p.o_orderpriority
  FROM (SELECT DISTINCT order_month FROM cells) m
  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM cells) p
), g AS (
  SELECT grid.order_month, grid.o_orderpriority, COALESCE(cells.n, 0) AS n
  FROM grid LEFT JOIN cells USING (order_month, o_orderpriority)
), shares AS (
  SELECT order_month, n,
         greatest(CAST(n AS DOUBLE)
                  / sum(n) OVER (PARTITION BY order_month), 1e-6) AS q,
         greatest(CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
                  / sum(n) OVER (), 1e-6) AS p
  FROM g
), terms AS (
  SELECT order_month, n,
         CAST(round((q - p) * ln(q / p) * 1000000000, 0) AS BIGINT) AS t
  FROM shares
)
SELECT CAST(order_month AS BIGINT) AS order_month,
       CAST(sum(n) AS BIGINT) AS n_orders,
       round(sum(t) / 1000000000.0, 6) AS psi
FROM terms GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Benford first-digit audit (r12)

# expected first-digit shares log10(1 + 1/d), precomputed ONCE in Python
# and injected as identical literals into the Spark grid and the SQL
# VALUES list so both engines compare against bit-identical constants
import math as _math

_BENFORD_SHARES = [
    (d, round(_math.log10(1.0 + 1.0 / d), 12)) for d in range(1, 10)
]


def benford_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order values — the classic
    fabricated-or-truncated-data screen a profiling pass runs on any
    money-like column (organically grown magnitudes follow
    log10(1 + 1/d); synthetic, capped, or copy-pasted values don't):
    per leading digit, the observed share against the Benford share,
    the excess, and the digit's chi-square contribution (sum the column
    for the test statistic against chi2(8)).

    Exactness: the leading digit is extracted through exact integer/
    string ops (floor → BIGINT → first character — never float log10,
    which can misplace a value sitting on a power-of-ten ulp); counts
    are exact int64; the expected shares are the SAME 12 dp literals on
    both engines; shares/chi2 are formed in one fixed op order from the
    exact counts and rounded 6 dp. All nine digits are materialized
    (zero-cell rule) — a digit that never occurs is an explicit zero
    row with its full expected-count chi-square term.

    Scale shape: one orders scan → ≤9-row hash aggregate; the digit
    grid is a 9-row literal frame and the total is a window sum over
    the 9-row relation — nothing after the aggregate sees data scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = spark.createDataFrame(
        _BENFORD_SHARES, "digit int, benford_share double"
    )
    from pyspark.sql import Window

    j = (
        grid.join(counts, "digit", "left")
        .select(
            "digit",
            "benford_share",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    total = F.sum("n").over(Window.partitionBy())
    share = F.col("n").cast("double") / total
    excess = share - F.col("benford_share")
    return (
        j.select(
            "digit",
            F.col("n").cast("long").alias("n_orders"),
            F.round(share, 6).alias("share"),
            "benford_share",
            F.round(excess, 6).alias("excess"),
            F.round(
                total * excess * excess / F.col("benford_share"), 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


_BENFORD_VALUES = ", ".join(f"({d}, {s!r})" for d, s in _BENFORD_SHARES)

# NOTE: named distinctly from the r5-era BENFORD_SQL above — the r12 build
# wave originally reused the name, silently clobbering the older
# benford_first_digit_audit oracle at module level (schema-mismatch found
# by the r12 full-suite gate).
BENFORD_ORDER_VALUES_SQL = f"""
WITH c AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                        1, 1) AS INT) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY 1
), g AS (
  SELECT digit, CAST(benford_share AS DOUBLE) AS benford_share
  FROM (VALUES {_BENFORD_VALUES}) AS t(digit, benford_share)
), j AS (
  SELECT g.digit, g.benford_share, COALESCE(c.n, 0) AS n
  FROM g LEFT JOIN c USING (digit)
), s AS (
  SELECT digit, benford_share, n,
         CAST(n AS DOUBLE) / sum(n) OVER () AS share,
         CAST(sum(n) OVER () AS DOUBLE) AS total
  FROM j
)
SELECT digit,
       CAST(n AS BIGINT) AS n_orders,
       round(share, 6) AS share,
       benford_share,
       round(share - benford_share, 6) AS excess,
       round(total * (share - benford_share) * (share - benford_share)
             / benford_share, 6) AS chi2_term
FROM s
ORDER BY digit
"""


# --------------------------------------------------------------------------
# Functional-dependency audit (r12)

# the audited (table, determinant, dependent) triples — ONE list drives
# both the Spark chain and FD_AUDIT_SQL (the shared-constant rule): two
# true dependencies (keys) as clean rows, three plausible-but-false ones
# as the violation signal a schema-inference pass needs
_FD_AUDITS = [
    ("orders", "o_orderkey", "o_orderdate"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
]


def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — does ``lhs → rhs`` actually hold?
    For each audited (table, determinant, dependent) triple: determinant
    groups, groups carrying MORE than one distinct dependent (the
    violations), the violation rate, and the worst group's dependent
    fan-out. The schema-semantics companion to
    :func:`referential_integrity_report` (which checks key EXISTENCE,
    not determination): a real FD with violations means dirty data or a
    wrong modeling assumption; a hoped-for FD with a high rate means
    the column pair cannot be collapsed into a dimension.

    Exactness: pure exact integers (per-group COUNT DISTINCT — the
    point of an FD audit is exactness, so no sketch here) and one
    division rounded 6 dp.

    Scale shape: one grouped exact-distinct aggregate per audited pair
    (the determinant-key shuffle each audit inherently needs), each
    folding to a 1-row frame before the tiny union; nothing joins, and
    adding audits scales linearly in independent aggregates."""
    parts = []
    for table, lhs, rhs in _FD_AUDITS:
        t = load_table(spark, sf_dir, table)
        per = t.groupBy(lhs).agg(F.count_distinct(F.col(rhs)).alias("n_rhs"))
        parts.append(
            per.agg(
                F.lit(table).alias("table_name"),
                F.lit(lhs).alias("determinant"),
                F.lit(rhs).alias("dependent"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
                F.round(
                    F.sum(
                        F.when(F.col("n_rhs") > 1, 1).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("violation_rate"),
                F.max("n_rhs").cast("long").alias("max_rhs_per_group"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name", "determinant", "dependent")


FD_AUDIT_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{table}' AS table_name, '{lhs}' AS determinant,
       '{rhs}' AS dependent,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       round(CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS violation_rate,
       CAST(max(n_rhs) AS BIGINT) AS max_rhs_per_group
FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs
      FROM {table} GROUP BY 1) g"""
    for table, lhs, rhs in _FD_AUDITS
) + "\nORDER BY table_name, determinant, dependent"
