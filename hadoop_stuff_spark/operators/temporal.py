"""Time-series joins Spark lacks as built-ins: as-of join and range
(interval) join — expressed as compositions of DataFrame ops so Catalyst
still plans them (no Python in the hot path, no crossJoin).

The reference has no joins at all (SURVEY.md §2.6 — the only temporal
artifact is arrival-order tailing, src/test/java/oz/poc/file/TailF.java:110-149),
but any CDR/flow-log engine needs "state at time of event" lookups; these
operators provide them Spark-first.

Scale design:

- :func:`asof_join` is the union + ordered-window carry-forward form: tag
  both sides, union, one hash Exchange on the key plus one Sort, then
  ``last(..., ignorenulls=True)`` carries the most recent right-side row
  forward onto each left row. Cost is identical to one sort-merge join
  (shuffle both sides once, sort once) regardless of time-skew, and there
  is NO per-left-row probe amplification — the classic
  "window over union" formulation used instead of a range-predicate join,
  which would explode to O(left × right-per-key) intermediate rows.
- :func:`range_join` buckets time into fixed-width cells: each point maps
  to exactly one bucket, each interval explodes to the (few) buckets it
  overlaps, and the join becomes a plain equi-join on ``bucket`` with the
  exact range predicate applied post-join. Candidate fan-out is bounded by
  ``ceil(interval_width / bucket_width) + 1`` per interval — at 100 TB this
  is a shuffled hash join on a high-cardinality key, never a
  BroadcastNestedLoopJoin (which is what naive ``a.join(b, range_pred)``
  degenerates to without an equality conjunct).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    right_tiebreak: Optional[str] = None,
    tolerance_seconds: Optional[float] = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: every left row picks the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` key group
    (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, equal
    timestamps match).

    Returns all left columns plus ``asof_ts`` (the matched right
    timestamp) and the requested ``right_cols``. ``how='left'`` keeps
    unmatched left rows with nulls; ``'inner'`` drops them.
    ``tolerance_seconds`` additionally requires
    ``left_ts - right_ts <= tolerance``.

    ``right_tiebreak``: column ordering right-side rows that share an
    identical (key, ts) — the greatest wins, making the pick
    deterministic (without it Spark's sort order between duplicate
    timestamps is partition-dependent).
    """
    from pyspark.sql import types as _T

    on = list(on)
    right_cols = list(right_cols or [])
    right_schema = {f.name: f.dataType for f in right.schema.fields}

    # one unioned relation: left rows carry their own payload, right rows
    # carry the as-of payload; _side orders right (0) before left (1) at
    # equal timestamps so ties match (ASOF's >= semantics).
    # left_ts is excluded from the payload — it re-enters the output as the
    # single aliased _ts column (a duplicate here would make any downstream
    # reference to it AMBIGUOUS_REFERENCE).
    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    # The right payload travels as ONE struct, carried forward whole with
    # last(ignorenulls=True): presence is per matched ROW, not per column,
    # so a NULL field in the matched right row stays NULL (pandas
    # merge_asof / DuckDB ASOF semantics) instead of inheriting an older
    # row's non-null value.
    r_struct_t = _T.StructType(
        [_T.StructField("_r_ts", right_schema[right_ts], True)]
        + [_T.StructField(c, right_schema[c], True) for c in right_cols]
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(
            F.col(right_ts).alias("_r_ts"), *[F.col(c) for c in right_cols]
        ).alias("_r"),
    )
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if right_tiebreak is not None:
        l_side = l_side.withColumn("_tb", F.lit(None).cast(right_schema[right_tiebreak]))
        r_side = r_side.withColumn("_tb", F.col(f"_r.{right_tiebreak}"))
        order.append(F.col("_tb").asc_nulls_last())

    unioned = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "_ts",
        "_side",
        *left_payload,
        F.last("_r", ignorenulls=True).over(w).alias("_rm"),
    ).select(
        *on,
        "_ts",
        "_side",
        *left_payload,
        F.col("_rm._r_ts").alias("asof_ts"),
        *[F.col(f"_rm.{c}").alias(f"asof_{c}") for c in right_cols],
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = F.col("asof_ts").isNotNull() & (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("asof_ts"))
            <= int(tolerance_seconds * 1_000_000)
        )
        if how == "inner":
            out = out.filter(in_tol)
        else:  # left: keep the row, null out the too-old match
            out = out.select(
                *on,
                "_ts",
                "_side",
                *left_payload,
                F.when(in_tol, F.col("asof_ts")).alias("asof_ts"),
                *[
                    F.when(in_tol, F.col(f"asof_{c}")).alias(f"asof_{c}")
                    for c in right_cols
                ],
            )
    elif how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out.select(
        *on,
        F.col("_ts").alias(left_ts),
        *left_payload,
        "asof_ts",
        *[F.col(f"asof_{c}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts < end`` — WITHOUT an equality key. Buckets both
    sides on ``floor(epoch / bucket_seconds)`` so Catalyst plans a shuffled
    equi-join on ``_bucket``; the exact range predicate filters post-join.
    Pick ``bucket_seconds`` ≈ the typical interval width so each interval
    lands in ~2 buckets.

    Output: all interval columns + all point columns (``how='left'``:
    intervals with no points keep null point columns).
    """
    p = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds)
    )
    iv = intervals.withColumn(
        "_buckets",
        F.sequence(
            F.floor(F.unix_timestamp(F.col(interval_start)) / bucket_seconds),
            F.floor(F.unix_timestamp(F.col(interval_end)) / bucket_seconds),
        ),
    ).withColumn("_bucket", F.explode("_buckets")).drop("_buckets")
    joined = iv.join(p, "_bucket", "inner").filter(
        (F.col(point_ts) >= F.col(interval_start)) & (F.col(point_ts) < F.col(interval_end))
    ).drop("_bucket")
    if how == "left":
        matched = joined
        return intervals.join(
            matched, [c for c in intervals.columns if c != "_bucket"], "left"
        )
    return joined


# --------------------------------------------------------------------------
# registry queries


def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the user's most recent prior (or
    simultaneous) click — the canonical 'state at time of event' lookup
    over the events table. Oracle: DuckDB ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["click_id", "click_value"],
        right_tiebreak="click_id",
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_click_id").alias("click_id"),
        F.round("asof_click_value", 2).alias("click_value"),
    )


ASOF_SQL = """
SELECT p.event_id, p.user_id, c.ts AS click_ts, c.event_id AS click_id,
       round(c.value, 2) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def range_error_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equality key): for each error event, how many
    purchase events — from ANY user — landed in the 5 minutes after it.
    Zero-count errors are kept (left semantics via re-join of counts)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    hits = range_join(
        purchases, errors, "p_ts", "win_start", "win_end", bucket_seconds=300
    )
    counts = hits.groupBy("error_id").agg(F.count(F.lit(1)).alias("n_purchases"))
    return (
        errors.join(counts, "error_id", "left")
        .select(
            "error_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


RANGE_SQL = """
SELECT e.event_id AS error_id, count(p.event_id) AS n_purchases
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 5 MINUTE
GROUP BY 1
"""


_STEP_UNITS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _step_seconds(step: str) -> int:
    """'15 minutes' -> 900. Python-side (interval EXTRACT(epoch) does not
    exist in Spark SQL); the grid's sequence() still uses the interval
    literal directly."""
    n, unit = step.strip().split()
    return int(n) * _STEP_UNITS[unit.lower()]


def resample(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    agg_cols: dict[str, Column],
    step: str = "1 hour",
    fill: str = "zero",
) -> DataFrame:
    """Regular-grid time-series resampling with gap fill — the op that
    turns irregular event streams into model-ready aligned series.

    Buckets rows per key to ``step`` boundaries, aggregates, then
    DENSIFIES: every key gets a row for every step between its own first
    and last bucket. Missing buckets fill with zero/null (``fill='zero'``)
    or carry the last observation forward (``fill='ffill'``, classic
    time-series imputation).

    Scale shape: one grouped agg over the facts (bucket+key — map-side
    partials), then per-key `sequence()` + `explode` generates the grid
    JVM-side (rows = sum of per-key span/step, i.e. the OUTPUT size — no
    driver loop, no cross join against a global calendar, and a key
    active for one day never pays for a ten-year table span). The grid
    left-joins the aggregates on (key, bucket) — one co-partitioned
    shuffle; ffill is a window last-value-ignore-nulls per key ordered by
    bucket (same partitioning, no extra exchange).
    """
    if step == "1 hour":
        bucket = F.date_trunc("hour", F.col(ts_col))
    else:
        step_s = _step_seconds(step)
        bucket = F.timestamp_seconds(
            F.floor(F.unix_timestamp(ts_col) / F.lit(step_s)).cast("long")
            * F.lit(step_s)
        )
    aggd = (
        df.withColumn("__bucket", bucket)
        .groupBy(*key_cols, "__bucket")
        .agg(*[c.alias(n) for n, c in agg_cols.items()])
    )
    spans = aggd.groupBy(*key_cols).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias("__bucket"),
    )
    joined = grid.join(aggd, [*key_cols, "__bucket"], "left")
    if fill == "zero":
        filled = joined.select(
            *key_cols,
            F.col("__bucket").alias("bucket"),
            *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in agg_cols],
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = joined.select(
            *key_cols,
            F.col("__bucket").alias("bucket"),
            *[
                F.last(F.col(n), ignorenulls=True).over(w).alias(n)
                for n in agg_cols
            ],
        )
    else:
        raise ValueError(f"unknown fill {fill!r} (use 'zero' or 'ffill')")
    return filled


def resampled_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification: hourly per-type event count + exact-cents value sum,
    zero-filled over each type's active span."""
    from hadoop_stuff_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    out = resample(
        ev.withColumn(
            "value_cents", F.round(F.col("value") * 100, 0).cast("long")
        ),
        "ts",
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)).cast("long"),
            "total_cents": F.sum("value_cents").cast("long"),
        },
        step="1 hour",
        fill="zero",
    )
    return out.select(
        "event_type",
        "bucket",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_cents").cast("long").alias("total_cents"),
    ).orderBy("event_type", "bucket")


RESAMPLE_SQL = """
WITH aggd AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
  FROM events
  GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM aggd GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
)
SELECT g.event_type, g.bucket,
       coalesce(a.n_events, 0) AS n_events,
       coalesce(a.total_cents, 0) AS total_cents
FROM grid g LEFT JOIN aggd a USING (event_type, bucket)
ORDER BY g.event_type, g.bucket
"""


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream: users are cohorted
    by the ISO week of their FIRST event; each (cohort, weeks-since)
    cell counts the cohort's users still active that week, plus the
    retention percentage vs the cohort's own week 0 — the table every
    growth dashboard draws as a retention triangle.

    Plan shape: one groupBy(user_id) for first-touch, one equi-join back
    to events (broadcastable when the user dimension is small; hash-join
    on user_id otherwise — both sides already shuffle-partitioned on the
    join key), a distinct on (cohort, week_n, user) to dedupe multiple
    events per week, then a small agg + one window over cohorts. Week
    arithmetic stays on day-exact integers (both sides truncate to week
    starts, so the day diff is an exact multiple of 7) — no float dates."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_n"),
        )
        .distinct()
    )
    counts = active.groupBy("cohort_week", "week_n").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    w0 = Window.partitionBy("cohort_week")
    return (
        counts.withColumn(
            "retention_pct",
            F.round(
                F.col("n_active")
                * 100.0
                / F.max(F.when(F.col("week_n") == 0, F.col("n_active"))).over(w0),
                2,
            ),
        )
        .orderBy("cohort_week", "week_n")
    )


COHORT_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('day', f.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_n
  FROM events e JOIN first f USING (user_id)
), counts AS (
  SELECT cohort_week, week_n, count(*) AS n_active FROM active GROUP BY 1, 2
)
SELECT cohort_week, week_n, n_active,
       round(n_active * 100.0 / max(CASE WHEN week_n = 0 THEN n_active END)
             OVER (PARTITION BY cohort_week), 2) AS retention_pct
FROM counts
ORDER BY cohort_week, week_n
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (event_type → next event_type) step, the
    observed count and transition probability — the behavioral model
    behind next-action prediction and funnel anomaly detection.

    Plan shape: ONE shuffle on user_id for the lead() window (ordered by
    ts with event_id as a deterministic tiebreak for simultaneous
    events), then a map-side-partial groupBy on the (from, to) pair and
    a tiny window over from-states for row-normalized probabilities.
    No self-join: lead() is the sequential structure."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    counts = steps.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_from = Window.partitionBy("event_type")
    return (
        counts.withColumn(
            "prob", F.round(F.col("n") * 1.0 / F.sum("n").over(per_from), 4)
        )
        .orderBy("event_type", "next_type")
    )


EVENT_TRANSITION_SQL = """
WITH steps AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), counts AS (
  SELECT event_type, next_type, count(*) AS n
  FROM steps WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, next_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 4) AS prob
FROM counts
ORDER BY event_type, next_type
"""


def time_weighted_avg_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event ``value`` signal: each
    observation is weighted by how long it was current (seconds until the
    user's next event; the final observation has no duration and drops
    out) — the correct mean for irregularly sampled gauges, where the
    arithmetic mean over-weights bursts.

    Exactness: durations are exact microsecond longs
    (``timestampdiff(MICROSECOND, …)``, mirrored by DuckDB's
    ``date_diff('microsecond', …)`` — both timezone-free, so the NTZ
    timestamps the catalog rebuilds stay exact), and each value×duration
    product
    is rounded to an integer unit BEFORE the sum so the aggregate is
    order-independent across partitionings (the engine-wide fixed-point
    rule, functions/money.py). Plan shape: one shuffle on user_id for
    the lead() window, then a map-side-partial re-agg to one row per
    user — no self-join against a shifted copy."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("next_ts", F.lead("ts").over(w))
        .withColumn("dt_us", F.expr("timestampdiff(MICROSECOND, ts, next_ts)"))
        .filter(F.col("dt_us").isNotNull())
    )
    weighted = F.round(F.col("value") * F.col("dt_us"), 0).cast("long")
    return (
        steps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(weighted).alias("num"),
            F.sum("dt_us").alias("den"),
        )
        .select(
            "user_id",
            "n_intervals",
            F.round(F.col("num") / F.col("den"), 4).alias("tw_avg_value"),
            F.round(F.col("den") / 1_000_000.0 / 3600.0, 4).alias("span_hours"),
        )
        .orderBy("user_id")
    )


TIME_WEIGHTED_AVG_SQL = """
WITH steps AS (
  SELECT user_id, value,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dt_us
  FROM events
)
SELECT user_id,
       count(*) AS n_intervals,
       round(sum(CAST(round(value * dt_us, 0) AS BIGINT)) / sum(dt_us), 4) AS tw_avg_value,
       round(sum(dt_us) / 1000000.0 / 3600.0, 4) AS span_hours
FROM steps WHERE dt_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


def order_streaks_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over customer purchase activity: each customer's
    LONGEST run of consecutive active months, reported as a distribution
    (streak length → customer count) — the engagement-continuity metric
    behind churn cohorts.

    Classic islands trick, fully declarative: distinct active month
    indexes per customer, then ``month_idx − dense_rank(month_idx)`` is
    constant within a consecutive run, so a groupBy on that island key
    yields run lengths with no iteration. Plan shape: one shuffle on
    o_custkey (distinct + both windows and the island groupBy all reuse
    the same hash partitioning), then a tiny distribution aggregate."""
    o = load_table(spark, sf_dir, "orders")
    months = (
        o.select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("month_idx"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("month_idx")
    islands = months.withColumn(
        "island", F.col("month_idx") - F.dense_rank().over(w)
    )
    runs = islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    longest = runs.groupBy("o_custkey").agg(F.max("run_len").alias("streak_months"))
    return (
        longest.groupBy("streak_months")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("streak_months")
    )


ORDER_STREAKS_SQL = """
WITH months AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS month_idx
  FROM orders
), islands AS (
  SELECT o_custkey, month_idx,
         month_idx - dense_rank() OVER (PARTITION BY o_custkey ORDER BY month_idx) AS island
  FROM months
), runs AS (
  SELECT o_custkey, island, count(*) AS run_len FROM islands GROUP BY 1, 2
), longest AS (
  SELECT o_custkey, max(run_len) AS streak_months FROM runs GROUP BY 1
)
SELECT streak_months, count(*) AS n_customers
FROM longest GROUP BY streak_months ORDER BY streak_months
"""


def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis over the event stream: how many users
    progressed view → click → purchase IN TIME ORDER (each stage strictly
    after the user's first completion of the previous stage, and within a
    24-hour conversion deadline per step) — the product-analytics staple
    that naive per-type counts get wrong because they ignore ordering.
    Complements ``relational.funnel_conversion`` (session-scoped 2-stage
    view→purchase): this one chains THREE stages across the user's whole
    history with a per-step deadline, the shape deadline-attribution
    funnels take. Without the deadline this corpus saturates (every user
    eventually does everything); with it the funnel is 150 → 150 → 60 → 25
    at sf0.01.

    One shuffle total: all three stage timestamps are unpartitioned-frame
    MIN windows over the SAME user_id partitioning (t2's predicate
    references t1, t3's references t2 — stage chaining without self-joins
    or per-stage rescans), then a per-user collapse and a single summary
    row. Conversion rates are exact-count ratios rounded to 4 dp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    deadline = F.expr("INTERVAL 24 HOURS")
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1") + deadline),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t2") + deadline),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked"),
        F.count("t3").alias("n_purchased"),
        F.round(F.count("t2") * 1.0 / F.count("t1"), 4).alias("click_rate"),
        F.round(F.count("t3") * 1.0 / F.count("t2"), 4).alias("purchase_rate"),
    )


STAGED_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
), s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                      AND ts <= t1 + INTERVAL 24 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM s1
), s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                      AND ts <= t2 + INTERVAL 24 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM s2
), per_user AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM s3 GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(t1) AS n_viewed,
       count(t2) AS n_clicked,
       count(t3) AS n_purchased,
       round(count(t2) * 1.0 / count(t1), 4) AS click_rate,
       round(count(t3) * 1.0 / count(t2), 4) AS purchase_rate
FROM per_user
"""


def ema_event_values(
    spark: SparkSession, sf_dir: str, alpha: float = 0.25
) -> DataFrame:
    """Per-user exponential moving average of the event ``value`` signal —
    the classic sequential recurrence (acc ← α·x + (1−α)·acc, seeded with
    the first observation) that windowed aggregates cannot express because
    each step depends on the previous RESULT, not a frame of inputs.

    Distributed shape (VERDICT r6 #2 — the whale-key fix): one shuffle on
    user_id (``repartition``), a JVM-side secondary sort
    (``sortWithinPartitions(user_id, ts, event_id)``), then ONE streaming
    Arrow fold (``mapInPandas``) that walks the sorted partition carrying
    (n, acc, last) per user across batches. No per-user array is ever
    materialized: the previous ``collect_list`` fold held one user's
    ENTIRE history as a single in-row array, which — unlike window state —
    cannot spill, so one whale key (bot account, 100M events) was an
    executor OOM / 2 GiB array failure at scale. Now per-task carried
    state is ONE open user (4 scalars — completed users emit at each
    Arrow batch boundary), and the whale's events stream through in
    bounded Arrow batches.

    Determinism: the sort order is total (event_id breaks ts ties) and
    the fold applies x·α + acc·(1−α) in that order, term by term — the
    identical op sequence DuckDB's ``list_reduce`` over
    ``list(... ORDER BY ts, event_id)`` performs, so the float results
    are bit-equal before the 4 dp round. A NULL value anywhere in a
    user's history makes that user's ema NULL (the HOF fold's and
    list_reduce's shared propagation rule)."""
    import math

    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    one_minus = 1.0 - alpha

    def fold(batches):
        # ADVICE r8 #5: the sorted input makes each user a CONTIGUOUS run,
        # so (a) run boundaries come from one vectorized uid-diff per batch
        # — no per-row dict lookup — and (b) every run except the last in a
        # batch is COMPLETE and emits at that batch boundary, so output
        # buffering is bounded by the Arrow batch size and the carried
        # state is exactly ONE open user (4 scalars), not O(users in
        # partition).  The fold itself stays a scalar loop on purpose: the
        # recurrence acc ← x·α + acc·(1−α) is a chain of DEPENDENT IEEE
        # rounds, and bit-equality with DuckDB's list_reduce requires the
        # identical op sequence — a closed-form vectorization would round
        # differently.
        carry = None  # [uid, n_events, acc, last, null_seen] — the open run

        def emit_row(out, st):
            out[0].append(int(st[0]))
            out[1].append(st[1])
            out[2].append(
                None if st[4] or math.isnan(st[2]) else float(st[2])
            )
            out[3].append(None if math.isnan(st[3]) else float(st[3]))

        for pdf in batches:
            if len(pdf) == 0:
                continue
            uids = pdf["user_id"].to_numpy()
            vals = pdf["value"].to_numpy(dtype="float64", na_value=np.nan)
            nulls = pdf["value"].isna().to_numpy()
            starts = np.flatnonzero(np.r_[True, uids[1:] != uids[:-1]])
            ends = np.r_[starts[1:], len(uids)]
            out = ([], [], [], [])
            for s, e in zip(starts, ends):
                uid = uids[s]
                xs = vals[s:e]
                if carry is not None and carry[0] == uid:
                    n, acc = carry[1] + (e - s), carry[2]
                    null_seen = carry[4] or bool(nulls[s:e].any())
                    i = 0
                else:
                    if carry is not None:
                        emit_row(out, carry)
                    n = e - s
                    acc = xs[0]
                    null_seen = bool(nulls[s:e].any())
                    i = 1
                for x in xs[i:]:
                    acc = x * alpha + acc * one_minus
                carry = [uid, n, acc, xs[-1], null_seen]
            if out[0]:
                yield pd.DataFrame(
                    {
                        "user_id": out[0],
                        "n_events": out[1],
                        "ema_value": out[2],
                        "last_value": out[3],
                    }
                )
        if carry is not None:
            out = ([], [], [], [])
            emit_row(out, carry)
            yield pd.DataFrame(
                {
                    "user_id": out[0],
                    "n_events": out[1],
                    "ema_value": out[2],
                    "last_value": out[3],
                }
            )

    folded = ev.repartition("user_id").sortWithinPartitions(
        "user_id", "ts", "event_id"
    ).mapInPandas(
        fold, "user_id bigint, n_events bigint, ema_value double, last_value double"
    )
    return folded.select(
        "user_id",
        "n_events",
        F.round("ema_value", 4).alias("ema_value"),
        F.round("last_value", 4).alias("last_value"),
    ).orderBy("user_id")


EMA_SQL = """
WITH per_user AS (
  SELECT user_id,
         count(*) AS n_events,
         list(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       round(list_reduce(vals, (acc, x) -> x * 0.25 + acc * (1.0 - 0.25)), 4) AS ema_value,
       round(vals[-1], 4) AS last_value
FROM per_user
ORDER BY user_id
"""


def cusum_daily_orders(
    spark: SparkSession, sf_dir: str, slack_millis: int = 500
) -> DataFrame:
    """CUSUM changepoint detection over each priority class's daily order
    counts: the classic upper cumulative-sum statistic
    ``S_i = max(0, S_{i-1} + (x_i − mean − slack))`` that flags sustained
    upward shifts a plain threshold misses.

    The max-reset recurrence looks sequential but is WINDOW-EXPRESSIBLE
    via the prefix-sum identity ``S_i = P_i − min(0, min_{j≤i} P_j)``
    (P = running sum of deviations), so the whole statistic is two
    ordered windows per group — no fold, no UDF, and the identical
    expression runs in DuckDB. Deviations are integer milli-units
    (count×1000 − rounded mean×1000 − slack), so every prefix sum is
    exact integer arithmetic — order-independent and engine-portable.

    Output per priority: the peak CUSUM (in original count units), the
    day it peaked (deterministic argmax: cusum desc, date asc), and how
    many days ran above half the peak — the report a pipeline-health
    monitor keys alerts from. Series length is day-cardinality (tiny);
    the windows never see fact rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderpriority", "o_orderdate").agg(
        F.count(F.lit(1)).alias("n")
    )
    wg = Window.partitionBy("o_orderpriority")
    w_ord = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mean_fp = F.round(F.avg(F.col("n") * 1000).over(wg), 0).cast("long")
    d = F.col("n") * 1000 - mean_fp - slack_millis
    stepped = daily.withColumn("d", d)
    cum = F.sum("d").over(w_ord)
    run = stepped.withColumn(
        "cusum", cum - F.least(F.lit(0).cast("long"), F.min(cum).over(w_ord))
    )
    peak = F.max("cusum").over(wg)
    ranked = run.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("o_orderpriority").orderBy(
                F.desc("cusum"), F.asc("o_orderdate")
            )
        ),
    ).withColumn("peak", peak)
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.round(F.first(F.col("peak")) / 1000.0, 3).alias("peak_cusum"),
            F.max(F.when(F.col("rk") == 1, F.col("o_orderdate"))).alias("peak_date"),
            F.sum(
                (F.col("cusum") * 2 > F.col("peak")).cast("long")
            ).alias("days_above_half_peak"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("o_orderpriority")
    )


CUSUM_SQL = """
WITH daily AS (
  SELECT o_orderpriority, o_orderdate, count(*) AS n
  FROM orders GROUP BY 1, 2
), stepped AS (
  SELECT o_orderpriority, o_orderdate, n,
         n * 1000
         - CAST(round(avg(n * 1000) OVER (PARTITION BY o_orderpriority), 0) AS BIGINT)
         - 500 AS d
  FROM daily
), summed AS (
  SELECT *, sum(d) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM stepped
), run AS (
  SELECT *, cum - least(CAST(0 AS BIGINT),
                        min(cum) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
  FROM summed
), ranked AS (
  SELECT *, max(cusum) OVER (PARTITION BY o_orderpriority) AS peak,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY cusum DESC, o_orderdate) AS rk
  FROM run
)
SELECT o_orderpriority,
       round(min(peak) / 1000.0, 3) AS peak_cusum,
       max(CASE WHEN rk = 1 THEN o_orderdate END) AS peak_date,
       CAST(sum(CASE WHEN cusum * 2 > peak THEN 1 ELSE 0 END) AS BIGINT) AS days_above_half_peak,
       count(*) AS n_days
FROM ranked
GROUP BY 1
ORDER BY 1
"""


def rolling_median_event_values(
    spark: SparkSession, sf_dir: str, window_rows: int = 5
) -> DataFrame:
    """Exact rolling median of the event ``value`` over each user's last
    ``window_rows`` events — the robust-smoothing counterpart to the EMA
    (a median window rejects single-event spikes that any linear filter
    lets through; it's the despiking pass a telemetry/cleaning pipeline
    runs before thresholding).

    Exactness across engines: the frame is ROWS-based over a TOTAL order
    (ts, event_id), the frame's values are sorted in-row, and the median
    is element arithmetic — (lo + hi) / 2 with lo = hi on odd frames —
    so both engines compute the identical doubles (no interpolating
    median() builtin, whose internal arithmetic is not contractual).

    Scale shape: one shuffle on user_id, per-user ordered frames of at
    most ``window_rows`` values — window state is O(window_rows), the
    same plan at any corpus size.

    The output column is named for the actual frame
    (``rolling_median{window_rows}``); ROLLING_MEDIAN_SQL is the oracle
    for the DEFAULT window_rows=5 only.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, F.floor(n / 2).cast("int") + 1)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round((lo + hi) / F.lit(2.0), 6).alias(
            f"rolling_median{window_rows}"
        ),
    )


ROLLING_MEDIAN_SQL = """
WITH w AS (
  SELECT event_id, user_id, value,
         list_sort(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS ls
  FROM events
)
SELECT event_id, user_id, value,
       round((ls[CAST(floor((len(ls) + 1) / 2) AS INT)]
              + ls[CAST(floor(len(ls) / 2) AS INT) + 1]) / 2.0e0, 6)
         AS rolling_median5
FROM w
"""


def dow_seasonal_outliers(
    spark: SparkSession, sf_dir: str, top: int = 20
) -> DataFrame:
    """Day-of-week seasonal anomaly detection over event volume: each
    day's total value is z-scored against the mean/std of ITS OWN
    weekday (Mondays vs Mondays), and the ``top`` most anomalous days
    surface. A plain global z-score flags every weekend of a weekly-
    periodic series; removing the weekday baseline first is the standard
    seasonal-naive residual, and the shape generalizes to any periodic
    key (hour-of-day, day-of-month).

    Cross-engine exactness: daily totals reduce the corpus to
    days-sized data; the weekday baseline is explicit sum/sumsq algebra
    (sqrt IS exactly rounded under IEEE-754, unlike stddev builtins'
    update order), z is rounded to 6 dp BEFORE the |z| ranking, ties
    break on day. Weekdays with no usable baseline are excluded (inner
    join) rather than dividing by zero: fewer than 2 observed days, OR
    zero variance (identical totals every week — the division would
    raise under ANSI mode, and a constant series has no outliers to
    score anyway).

    Scale shape: one shuffle to daily totals (map-side partial agg —
    the exchange carries O(days x partitions) rows), then a 7-row
    broadcast join; the top-k is TakeOrderedAndProject, never a global
    sort.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("day_total"))
        .withColumn("dow", F.dayofweek("day"))
    )
    n = F.col("n_days")
    base = (
        daily.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("day_total").alias("_s"),
            F.sum(F.col("day_total") * F.col("day_total")).alias("_ss"),
        )
        .filter(n >= 2)
        .select(
            "dow",
            "n_days",
            (F.col("_s") / n).alias("dow_mean"),
            # greatest(..., 0): identical totals can yield a slightly
            # NEGATIVE fp variance (ss - s*s/n rounds below zero), and
            # sqrt of that is NaN — which passes `> 0` in Spark (NaN
            # compares greater) and crashes DuckDB. Clamp first.
            F.sqrt(
                F.greatest(
                    (F.col("_ss") - F.col("_s") * F.col("_s") / n) / (n - 1),
                    F.lit(0.0),
                )
            ).alias("dow_std"),
        )
        .filter(F.col("dow_std") > 0)
    )
    scored = daily.join(F.broadcast(base), "dow").select(
        "day",
        "dow",
        F.round("day_total", 6).alias("day_total"),
        F.round("dow_mean", 6).alias("dow_mean"),
        F.round(
            (F.col("day_total") - F.col("dow_mean")) / F.col("dow_std"), 6
        ).alias("z"),
    )
    return scored.orderBy(F.abs(F.col("z")).desc(), F.asc("day")).limit(top)


DOW_SEASONAL_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, sum(value) AS day_total
  FROM events GROUP BY 1
), d AS (
  SELECT day, dayofweek(day) + 1 AS dow, day_total FROM daily
), base AS (
  SELECT dow, count(*) AS n_days,
         sum(day_total) / count(*) AS dow_mean,
         sqrt(greatest((sum(day_total * day_total)
                        - sum(day_total) * sum(day_total) / count(*))
                       / (count(*) - 1), 0)) AS dow_std
  FROM d GROUP BY dow HAVING count(*) >= 2
), base_ok AS (
  SELECT * FROM base WHERE dow_std > 0
)
SELECT day, d.dow, round(day_total, 6) AS day_total,
       round(dow_mean, 6) AS dow_mean,
       round((day_total - dow_mean) / dow_std, 6) AS z
FROM d JOIN base_ok base ON d.dow = base.dow
ORDER BY abs(round((day_total - dow_mean) / dow_std, 6)) DESC, day
LIMIT 20
"""


def sessionize(
    df, user_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30
):
    """THE gaps-and-islands sessionizer (single implementation — funnel
    conversion and the interval-overlap join both build on it): a new
    session starts at a user's first event or after a gap of more than
    ``gap_minutes`` of whole-second event time (unix_timestamp
    truncation — the cross-engine contract; DuckDB oracles must mirror
    floor(epoch())). Adds a per-user ``session_id`` (1-based running
    count); all input columns pass through."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    sec = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(sec).over(w)
    new_sess = (prev.isNull() | (sec - prev > gap)).cast("int")
    return df.withColumn("session_id", F.sum(new_sess).over(w))


def concurrent_session_pairs(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    bucket_seconds: int = 3600,
    top: int = 25,
) -> DataFrame:
    """INTERVAL×INTERVAL overlap join: which user pairs were active at
    the same time, and for how long — co-presence/concurrency analysis
    (fraud rings, shared-device detection, capacity planning). Sessions
    come from the gaps-and-islands sessionizer already certified by the
    funnel ops; a pair of sessions overlaps iff
    a.start <= b.end AND b.start <= a.end.

    Scale shape — the point of this operator: `range_join` covers
    point-in-interval; interval-vs-interval cannot equi-join directly
    (a naive join on the overlap predicate is a BroadcastNestedLoopJoin
    — quadratic). Each session interval explodes to the (few) fixed
    ``bucket_seconds`` cells it touches, the join becomes a plain
    equi-join on the cell, the exact overlap predicate re-applies
    post-join, and multi-cell double-matches collapse with ONE
    dropDuplicates on the session-pair key BEFORE aggregation. Fan-out
    per session is bounded by ceil(duration / bucket) + 1. Overlap
    seconds are exact integer epoch arithmetic summed as longs —
    order-independent, no float drift.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = (
        sessionize(ev.select("user_id", "ts"), gap_minutes=gap_minutes)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("ss"),
            F.max(F.unix_timestamp("ts")).alias("se"),
        )
    )
    cells = sess.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.col("ss") / bucket_seconds),
                F.floor(F.col("se") / bucket_seconds),
            )
        ),
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.ss") <= F.col("b.se"))
            & (F.col("b.ss") <= F.col("a.se")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_id").alias("sess_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_id").alias("sess_b"),
            (
                F.least(F.col("a.se"), F.col("b.se"))
                - F.greatest(F.col("a.ss"), F.col("b.ss"))
            ).alias("overlap_s"),
        )
        .dropDuplicates(["user_a", "sess_a", "user_b", "sess_b"])
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_session_pairs"),
            F.sum("overlap_s").alias("total_overlap_s"),
        )
        .orderBy(
            F.desc("total_overlap_s"), F.asc("user_a"), F.asc("user_b")
        )
        .limit(top)
    )


CONCURRENT_SESSIONS_SQL = """
WITH sess AS (
  -- floor(epoch()) mirrors Spark unix_timestamp's whole-second
  -- truncation: with fractional seconds a boundary-touching pair
  -- (overlap exactly 0) would exist on one engine only
  SELECT user_id, session_id,
         min(CAST(floor(epoch(ts)) AS BIGINT)) AS ss,
         max(CAST(floor(epoch(ts)) AS BIGINT)) AS se
  FROM (
    SELECT user_id, ts,
           sum(CASE WHEN prev_s IS NULL OR s - prev_s > 1800
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM (
      SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts) AS prev_s
      FROM events
    )
  )
  GROUP BY 1, 2
), pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         least(a.se, b.se) - greatest(a.ss, b.ss) AS overlap_s
  FROM sess a JOIN sess b
    ON a.user_id < b.user_id AND a.ss <= b.se AND b.ss <= a.se
)
SELECT user_a, user_b, count(*) AS n_session_pairs,
       CAST(sum(overlap_s) AS BIGINT) AS total_overlap_s
FROM pairs GROUP BY 1, 2
ORDER BY total_overlap_s DESC, user_a, user_b
LIMIT 25
"""


def ohlc_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) resampling of the event ``value``
    signal into hourly buckets per event_type — the candlestick
    downsample every telemetry/market pipeline runs before charting or
    coarse modeling (first/last need an ORDER, which plain min/max
    aggregation cannot express).

    Cross-engine exactness: open/close pick RAW stored doubles (no
    arithmetic at all — both engines return identical bits), selected
    by two row_number windows over the (ts, event_id) total order —
    not min_by/arg_min builtins, whose composite-key tie semantics are
    not contractual across engines.

    Scale shape: ONE hash shuffle on (event_type, hour bucket) feeds
    both windows AND the final aggregate (same partitioning reused);
    per-bucket window state is a counter. Output is buckets-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    # close = the row whose ascending rank equals the partition size —
    # an UNORDERED count frame is sort-compatible with wa, so the whole
    # thing costs ONE per-partition sort (a second, descending
    # row_number window would sort every partition twice)
    wn = Window.partitionBy("event_type", "bucket")
    ranked = b.withColumn("_ra", F.row_number().over(wa)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    return (
        ranked.groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(
                F.when(F.col("_ra") == F.col("_n"), F.col("value"))
            ).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "bucket")
    )


OHLC_SQL = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
         ) AS ra,
         count(*) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
         ) AS n
  FROM events
)
SELECT event_type, bucket,
       max(CASE WHEN ra = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN ra = n THEN value END) AS close,
       count(*) AS n_events
FROM ranked GROUP BY 1, 2
ORDER BY event_type, bucket
"""


def user_activity_span(spark: SparkSession, sf_dir: str, top: int = 50) -> DataFrame:
    """Per-user lifetime profile: first/last event, span in whole days,
    distinct ACTIVE days, and events per active day — the engagement
    table cohort/churn analyses start from (active-day intensity
    separates "daily user" from "two bursts a year apart", which raw
    counts and spans both hide). Top ``top`` users by event count
    (ties: user_id) keep the output bounded; the oracle covers this
    default.

    Exactness: span uses whole-day date arithmetic (datediff /
    date_diff on DATE — timezone-free after the shared CAST); intensity
    is an exact integer ratio rounded once at 6 dp. One hash aggregate
    on user_id (map-side partial), then TakeOrderedAndProject.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count_distinct(F.to_date("ts")).alias("active_days"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "first_ts",
            "last_ts",
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias(
                "span_days"
            ),
            "active_days",
            "n_events",
            F.round(
                F.col("n_events") / F.col("active_days"), 6
            ).alias("events_per_active_day"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(top)
    )


USER_ACTIVITY_SPAN_SQL = """
SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
       date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
         AS span_days,
       count(DISTINCT CAST(ts AS DATE)) AS active_days,
       count(*) AS n_events,
       round(count(*) * 1.0 / count(DISTINCT CAST(ts AS DATE)), 6)
         AS events_per_active_day
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 50
"""


def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per priority class — the trend
    readout every pipeline dashboard keys on, computed with the exact
    integer-cent monthly sums (order-independent, engine-portable) and a
    lag window over the tiny month series.

    Growth is vs the previous OBSERVED month for the class (a gap month
    simply isn't a row — document-before-use, the resample operator fills
    calendars when that matters). First observed month has NULL growth.
    Revenue sums are always positive here, but the > 0 guard still
    protects the division under ANSI (the degenerate-input rule).

    Scale shape: one scan to |classes|×|months| cells (map-side partial
    cent sums), then a lag window over the cell table — fact rows never
    enter a window."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("_cents")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("_cents").over(w)
    growth = F.when(
        prev > 0, F.round((F.col("_cents") - prev).cast("double") / prev, 6)
    )
    return monthly.select(
        "o_orderpriority",
        "month",
        F.round(F.col("_cents") / 100.0, 2).alias("revenue"),
        growth.alias("mom_growth"),
    ).orderBy("o_orderpriority", "month")


MOM_GROWTH_SQL = """
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month,
       round(cents / 100.0, 2) AS revenue,
       CASE WHEN lag(cents) OVER w > 0 THEN
         round(CAST(cents - lag(cents) OVER w AS DOUBLE)
               / lag(cents) OVER w, 6)
       END AS mom_growth
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
ORDER BY o_orderpriority, month
"""


def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics: mean gap, coefficient of
    variation, and the Goh–Barabási burstiness B = (σ−μ)/(σ+μ) — the
    bot-vs-human separator (metronomic automation drives B toward −1,
    bursty human sessions toward +1, Poisson arrivals to 0).

    Exactness: gaps are exact integer MICROSECONDS via timestampdiff
    (``unix_micros`` rejects the TIMESTAMP_NTZ the catalog rebuilds —
    the round-6 rule), and Σgap / Σgap² are exact decimal integer sums
    (squares overflow bigint at scale), cast to double once and combined
    in a fixed op order. Users with <2 gaps or zero mean are excluded
    (undefined statistic, the degenerate-input rule); σ uses the
    population form n rather than n−1 so B stays in [−1, 1].

    Scale shape: one shuffle on user_id for the lag window (sort within
    user only), then one map-side-combinable aggregate per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", F.lag("ts").over(w).alias("_prev"))
        .select(
            "user_id",
            F.expr("timestampdiff(MICROSECOND, _prev, ts)").alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    gc = F.col("g").cast("decimal(19,0)")
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(gc).alias("_s"),
        F.sum(gc * gc).alias("_ss"),
    )
    n = F.col("n_gaps").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mu = s / n
    var = ss / n - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = (F.col("n_gaps") >= 2) & (mu > 0)
    return (
        agg.select(
            "user_id",
            "n_gaps",
            F.round(mu / 1000000.0, 4).alias("mean_gap_s"),
            F.when(ok, F.round(sigma / mu, 6)).alias("cv_gap"),
            F.when(ok, F.round((sigma - mu) / (sigma + mu), 6)).alias("burstiness"),
        )
        .orderBy("user_id")
    )


USER_BURSTINESS_SQL = """
WITH gaps AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS g
  FROM events
), agg AS (
  SELECT user_id, count(*) AS n_gaps,
         sum(CAST(g AS HUGEINT)) AS s,
         sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS ss
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id
), dbl AS (
  SELECT user_id, n_gaps,
         CAST(n_gaps AS DOUBLE) AS n,
         CAST(s AS DOUBLE) AS s, CAST(ss AS DOUBLE) AS ss
  FROM agg
), st AS (
  SELECT user_id, n_gaps,
         s / n AS mu,
         sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS sigma
  FROM dbl
)
SELECT user_id, n_gaps,
       round(mu / 1000000.0, 4) AS mean_gap_s,
       CASE WHEN n_gaps >= 2 AND mu > 0 THEN round(sigma / mu, 6) END AS cv_gap,
       CASE WHEN n_gaps >= 2 AND mu > 0 THEN
         round((sigma - mu) / (sigma + mu), 6)
       END AS burstiness
FROM st
ORDER BY user_id
"""


def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credits the user's EARLIEST
    click-or-view at or before it — the complement of
    ``asof_purchase_last_click`` (last-touch), and the two reports
    bracketing every marketing-attribution debate.

    Same union + ordered-window shape as the as-of join (one shuffle on
    user_id, no join amplification), but carrying ``first_value`` with
    ignorenulls instead of ``last``: the running FIRST touch needs no
    re-scan however long the history grows. Touches order before
    purchases at equal timestamps (≤ semantics, the asof convention).
    Purchases with no prior touch report 'none'. Hours-to-convert
    averages exact integer microsecond diffs (fixed-point rule), rounded
    to 4 dp."""
    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("_ts"),
        F.col("event_id").alias("_eid"),
        F.lit(0).alias("_side"),
        F.struct("ts", "event_type").alias("_touch"),
    )
    from pyspark.sql import types as _T

    touch_t = _T.StructType(
        [
            _T.StructField("ts", ev.schema["ts"].dataType),
            _T.StructField("event_type", _T.StringType()),
        ]
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("_ts"),
        F.col("event_id").alias("_eid"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(touch_t).alias("_touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_ts", "_side", "_eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        touches.unionByName(purchases)
        .select(
            "user_id", "_ts", "_side",
            F.first("_touch", ignorenulls=True).over(w).alias("_ft"),
        )
        .filter(F.col("_side") == 1)
    )
    micros = F.expr("timestampdiff(MICROSECOND, _ft.ts, _ts)")
    return (
        carried.select(
            F.coalesce(F.col("_ft.event_type"), F.lit("none")).alias(
                "first_touch_type"
            ),
            # decimal sum: ~3.2e13 micros/purchase-year × 1e11 purchases
            # overflows int64 (ANSI crash) while the oracle's HUGEINT
            # silently succeeds — the engine-wide decimal-sums rule
            micros.cast("decimal(19,0)").alias("_m"),
        )
        .groupBy("first_touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum("_m").cast("double") / F.count("_m") / 3600000000.0, 4
            ).alias("avg_hours_to_convert"),
        )
        .orderBy("first_touch_type")
    )


FIRST_TOUCH_SQL = """
WITH u AS (
  SELECT user_id, ts AS _ts, event_id AS _eid, 0 AS _side,
         ts AS touch_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
  UNION ALL
  SELECT user_id, ts, event_id, 1, NULL, NULL
  FROM events WHERE event_type = 'purchase'
), carried AS (
  SELECT user_id, _ts, _side,
         first_value(touch_ts IGNORE NULLS) OVER w AS ft_ts,
         first_value(touch_type IGNORE NULLS) OVER w AS ft_type
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY _ts, _side, _eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT coalesce(ft_type, 'none') AS first_touch_type,
       count(*) AS n_purchases,
       round(CAST(sum(date_diff('microsecond', ft_ts, _ts)) AS DOUBLE)
             / count(date_diff('microsecond', ft_ts, _ts))
             / 3600000000.0, 4) AS avg_hours_to_convert
FROM carried WHERE _side = 1
GROUP BY 1
ORDER BY 1
"""


def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users with a 7-row trailing moving average and
    week-over-week change — the first chart on every product dashboard,
    and the operational drift tripwire for an event pipeline (a silent
    ingestion gap shows up as a DAU cliff before anything else).

    Exactness: DAU is an exact per-day COUNT(DISTINCT user_id); the
    moving average is an integer window sum over up to 7 rows divided
    once (round 4); WoW change divides exact integers (round 6, NULL
    when no row 7 back). Both window metrics are over OBSERVED days —
    a wholly-missing day is absent (lag(7) then reaches 8 days back);
    resample first when calendar alignment matters.

    Scale shape: one fact scan into a per-day distinct aggregate
    (two-phase: partial distinct per partition, final per day), then
    windows over the tiny day series. The global-ordered window sees
    |days| rows, never facts."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    w = Window.orderBy("day")
    prev7 = F.lag("dau", 7).over(w)
    return daily.select(
        "day",
        "dau",
        "n_events",
        F.round(
            F.sum("dau").over(w7).cast("double") / F.count(F.lit(1)).over(w7), 4
        ).alias("dau_ma7"),
        F.when(
            prev7 > 0,
            F.round((F.col("dau") - prev7).cast("double") / prev7, 6),
        ).alias("wow_change"),
    ).orderBy("day")


DAU_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         count(DISTINCT user_id) AS dau,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT day, dau, n_events,
       round(CAST(sum(dau) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS dau_ma7,
       CASE WHEN lag(dau, 7) OVER (ORDER BY day) > 0 THEN
         round(CAST(dau - lag(dau, 7) OVER (ORDER BY day) AS DOUBLE)
               / lag(dau, 7) OVER (ORDER BY day), 6)
       END AS wow_change
FROM daily
ORDER BY day
"""


def session_path_topk(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    top: int = 20,
    max_events: int = 64,
) -> DataFrame:
    """Most-travelled session paths: each session's event types joined in
    (ts, event_id) order into a '>' path string, counted across the
    corpus — the path-mining readout behind every "where do users go
    after signup" question, built on THE shared gaps-and-islands
    sessionizer (:func:`sessionize`).

    Deterministic: the in-session order is total (event_id breaks ts
    ties) via a row_number over (ts, event_id); top-k is a
    TakeOrderedAndProject (count desc, path asc), never a global sort.

    Scale shape (VERDICT r7 #2): the inactivity gap bounds session
    DURATION, not row count — an always-on bot (events every minute,
    never a 30-min silence, for months) is ONE session, and a naive
    collect_list would carry its unbounded event array through the
    groupBy as a single un-spillable row.  So events are ranked
    in-session with a (sort-based, spillable) window row_number and
    only ranks ≤ ``max_events`` are collected — collect_list skips the
    NULLs the when() leaves for later ranks, so the aggregation buffer
    is bounded at ``max_events`` structs per session no matter how long
    the whale is.  Truncation is reported, not hidden: ``n_truncated``
    counts the sessions whose path was cut; the oracle SQL mirrors the
    same rank cutoff so parity holds even when truncation fires.  The
    row_number window partitions on (user_id, session_id), which the
    following groupBy reuses — no extra exchange vs the uncapped plan."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    s = sessionize(ev, gap_minutes=gap_minutes)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    ranked = s.withColumn("rn", F.row_number().over(w))
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("rn") <= max_events,
                        F.struct("ts", "event_id", "event_type"),
                    )
                )
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    paths = ranked.groupBy("user_id", "session_id").agg(
        path.alias("path"),
        (F.max("rn") > max_events).alias("truncated"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.col("truncated").cast("long")).alias("n_truncated"),
        )
        .withColumn("path_len", F.size(F.split(F.col("path"), ">")))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top)
        .select("path", "path_len", "n_sessions", "n_truncated")
    )


SESSION_PATH_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS session_id
  FROM t
), r AS (
  SELECT user_id, session_id, ts, event_id, event_type,
         row_number() OVER (
           PARTITION BY user_id, session_id ORDER BY ts, event_id
         ) AS rn
  FROM s
), paths AS (
  SELECT user_id, session_id,
         array_to_string(
           list(event_type ORDER BY ts, event_id) FILTER (WHERE rn <= 64),
           '>') AS path,
         max(rn) > 64 AS truncated
  FROM r GROUP BY user_id, session_id
)
SELECT path,
       CAST(len(string_split(path, '>')) AS INTEGER) AS path_len,
       count(*) AS n_sessions,
       count(*) FILTER (WHERE truncated) AS n_truncated
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


def weekly_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: users grouped by first-activity week, each
    cohort's purchase revenue accumulated per week-since-signup — the
    retention economics table (cohort_retention_weekly's money twin).

    Exactness: revenue is micro-unit fixed-point (the events ``value``
    column's 6 dp contract), cohort week is date_trunc('week') (ISO
    Monday on both engines), week index is exact integer day-diff / 7,
    and the running cumulative rides an integer window sum — the only
    divisions are two exact-integer ratios rounded at the end.

    Scale shape: one fact scan for first-activity (per-user min — hash
    agg), one for purchases, one join on user_id, then windows over the
    cohort×week cell table."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    cohort_sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("buy_week"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("_micros"),
    )
    cells = (
        buys.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("buy_week", "cohort_week") / 7).cast("int").alias(
                "week_index"
            ),
        )
        .agg(F.sum("_micros").alias("_rev"))
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_index",
            "n_users",
            F.round(F.col("_rev") / 1000000.0, 2).alias("revenue"),
            F.round(
                F.sum("_rev").over(w_cum).cast("double") / 1000000.0
                / F.col("n_users"),
                4,
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "week_index")
    )


COHORT_LTV_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
), sizes AS (
  SELECT cohort_week, count(*) AS n_users FROM first GROUP BY 1
), buys AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS buy_week,
         CAST(round(value * 1000000, 0) AS BIGINT) AS micros
  FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, b.buy_week) / 7 AS INTEGER)
           AS week_index,
         sum(b.micros) AS rev
  FROM buys b JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.week_index, s.n_users,
       round(c.rev / 1000000.0, 2) AS revenue,
       round(CAST(sum(c.rev) OVER (
               PARTITION BY c.cohort_week ORDER BY c.week_index
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) / 1000000.0 / s.n_users, 4) AS cum_ltv_per_user
FROM cells c JOIN sizes s USING (cohort_week)
ORDER BY c.cohort_week, c.week_index
"""


def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of per-user gaps between
    consecutive purchases, summarized per purchase-ordinal (1st→2nd,
    2nd→3rd, ...) — the retention-curve companion that answers "do repeat
    buyers speed up or churn out".

    Exactness: gaps are exact integer MICROSECONDS (timestampdiff — the
    NTZ-safe rule) converted to fractional days only inside the rounded
    outputs; percentiles ride the portable exact pair. Scale shape: one
    purchase filter, one lag window within user (hash shuffle on
    user_id), one small aggregate per ordinal — output rows = max
    purchases per user."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        F.row_number().over(w).alias("ordinal"),
        F.lag("ts").over(w).alias("_prev"),
    ).filter(F.col("_prev").isNotNull())
    gap_days = (
        F.expr("timestampdiff(MICROSECOND, _prev, ts)").cast("double")
        / 86400000000.0
    )
    return (
        seq.select((F.col("ordinal") - 1).alias("repeat_number"),
                   gap_days.alias("gap_days"))
        .groupBy("repeat_number")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.expr("percentile(gap_days, 0.5)"), 4).alias(
                "median_gap_days"
            ),
            F.round(F.expr("percentile(gap_days, 0.9)"), 4).alias(
                "p90_gap_days"
            ),
        )
        .orderBy("repeat_number")
    )


REPEAT_PURCHASE_SQL = """
WITH p AS (
  SELECT user_id, ts,
         row_number() OVER w AS ordinal,
         lag(ts) OVER w AS prev
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), gaps AS (
  SELECT ordinal - 1 AS repeat_number,
         CAST(date_diff('microsecond', prev, ts) AS DOUBLE)
           / 86400000000.0 AS gap_days
  FROM p WHERE prev IS NOT NULL
)
SELECT repeat_number,
       count(*) AS n_users,
       round(quantile_cont(gap_days, 0.5), 4) AS median_gap_days,
       round(quantile_cont(gap_days, 0.9), 4) AS p90_gap_days
FROM gaps
GROUP BY repeat_number
ORDER BY repeat_number
"""


def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type: counts and the share
    of the type's daily cycle in each hour — the load-shape readout
    capacity planning and anomaly baselines start from (and the
    finer-grained companion to the day-of-week chi² scan).

    Exactness: integer counts, one window-sum share division per cell
    (6 dp). Scale: one scan to |types|×24 cells, window over the cell
    table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_t = Window.partitionBy("event_type")
    return cells.select(
        "event_type",
        "hour_of_day",
        "n_events",
        F.round(
            F.col("n_events").cast("double") / F.sum("n_events").over(w_t), 6
        ).alias("type_share"),
    ).orderBy("event_type", "hour_of_day")


HOURLY_PROFILE_SQL = """
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_of_day, n_events,
       round(CAST(n_events AS DOUBLE)
             / sum(n_events) OVER (PARTITION BY event_type), 6) AS type_share
FROM cells
ORDER BY event_type, hour_of_day
"""


def ks_interarrival_expfit(
    spark: SparkSession,
    sf_dir: str,
    exact: bool = True,
    n_probes: int = 99,
    probe_accuracy: int = 10_000,
    gap_bucket: str = "day",
) -> DataFrame:
    """Kolmogorov–Smirnov test of whether each event type's inter-arrival
    gaps are exponential (= the arrivals are Poisson): the load-model
    sanity check behind every capacity plan — bot traffic, batch replays,
    and thundering herds all show up as a fat KS distance from the
    memoryless fit.

    Statistic: the two-sided sup over the step ECDF,
    D = max_i max(i/n − F(g_(i)), F(g_(i)) − (i−1)/n) with
    F(g) = 1 − exp(−g/mean); mean is the exact integer-microsecond gap
    sum divided once (identical operands both engines). Each step term
    is rounded to 6 dp before the max (the engine-wide libm-ulp
    convention — exp may differ by an ulp between engines, the round
    erases it). `reject_exponential` applies the n-scaled 5% critical
    value 1.36/√n.

    Scale shape (``exact=True``, the oracle baseline): two ordered
    windows per event type (the ts order for gaps, the gap order for the
    ECDF rank) — partition-local sorts, spillable; no self-join, no
    collect. At 100 TB a single dominant type makes those sorts one
    giant window partition, so ``exact=False`` (VERDICT r8 #3) is the
    scale path, the KLL-bucketed-ECDF convention:

    - gaps form inside (event_type, ``gap_bucket``) window partitions
      (any date_trunc unit) — parallelism is #type-buckets instead of
      #types; at most one gap per type-bucket (the boundary crossing) is
      dropped, a vanishing fraction of any type dense enough to need
      this path. A type SPARSE relative to the bucket (≤1 event per
      bucket) loses every gap — it is still reported, with n_gaps 0 and
      NULL stat/verdict ("bucketing starved this type"), never silently
      dropped; coarsen ``gap_bucket`` ("week"/"month") to cover it;
    - NO ECDF rank window: one hash aggregate per type collects n, the
      exact gap sum, and ``n_probes-1`` approx_percentile cut points
      (mergeable sketch, accuracy ``probe_accuracy``); the sup runs over
      the probe grid only — per type a tiny (n_probes-1)-row explode.

    The grid statistic evaluates |ECDF − F| at the probe quantiles only
    (where the sketch pins ECDF(q_j) = (j+1)/n_probes up to rank error),
    so it under-reads the exact sup by at most grid pitch + sketch rank
    error ≈ 1/n_probes + 1/probe_accuracy and over-reads by at most the
    rank error alone — ``reject_exponential`` is conservative up to that
    sliver. Deviation is pinned by a test against the exact form."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    if exact:
        w_ts = Window.partitionBy("event_type").orderBy("ts", "event_id")
    else:
        ev = ev.withColumn("_bucket", F.date_trunc(gap_bucket, "ts"))
        w_ts = Window.partitionBy("event_type", "_bucket").orderBy(
            "ts", "event_id"
        )
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w_ts))
        .withColumn(
            "gap_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
        )
        .filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
        .select("event_type", "event_id", "gap_us")
    )
    if not exact:
        probs = [j / n_probes for j in range(1, n_probes)]
        agg = gaps.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").alias("sum_us"),
            F.percentile_approx("gap_us", probs, probe_accuracy).alias("_qs"),
        )
        mean_us = F.col("sum_us").cast("double") / F.col("n_gaps")
        probe = agg.select(
            "event_type",
            "n_gaps",
            F.round(mean_us / 1000000.0, 4).alias("mean_gap_s"),
            mean_us.alias("_mean_us"),
            F.posexplode("_qs").alias("_j", "_q"),
        )
        # probe j (0-based) sits at empirical mass p = (j+1)/n_probes;
        # evaluate |ECDF − F| at the probe only — using the step's lower
        # edge j/n_probes here would double-count the grid pitch and
        # bias the statistic HIGH (measured +0.01 at sf0.01)
        f_exp = F.lit(1.0) - F.exp(
            -F.col("_q").cast("double") / F.col("_mean_us")
        )
        p = (F.col("_j") + 1).cast("double") / F.lit(float(n_probes))
        d_j = F.round(F.greatest(p - f_exp, f_exp - p), 6)
        stats = (
            probe.select("event_type", "n_gaps", "mean_gap_s", d_j.alias("_d"))
            .groupBy("event_type")
            .agg(
                F.first("n_gaps").alias("n_gaps"),
                F.first("mean_gap_s").alias("mean_gap_s"),
                F.max("_d").alias("ks_stat"),
            )
            .withColumn(
                "reject_exponential",
                F.col("ks_stat")
                > F.lit(1.36) / F.sqrt(F.col("n_gaps").cast("double")),
            )
        )
        # a type sparse relative to gap_bucket (≤1 event per bucket) has
        # EVERY gap bucketed away — without this outer join it would
        # vanish from the report while the exact form still verdicts it.
        # Emit it loudly instead: n_gaps 0, NULL stat/verdict ("bucketing
        # starved this type — coarsen gap_bucket"), never a silent drop.
        eligible = (
            ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("_n_events"))
            .filter(F.col("_n_events") >= 2)
            .select("event_type")
        )
        return (
            eligible.join(stats, "event_type", "left")
            .select(
                "event_type",
                F.coalesce("n_gaps", F.lit(0)).alias("n_gaps"),
                "mean_gap_s",
                "ks_stat",
                "reject_exponential",
            )
            .orderBy("event_type")
        )
    w_t = Window.partitionBy("event_type")
    w_rk = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    n = F.count(F.lit(1)).over(w_t)
    mean_us = F.sum("gap_us").over(w_t).cast("double") / n
    i = F.row_number().over(w_rk)
    f_exp = F.lit(1.0) - F.exp(-F.col("gap_us").cast("double") / mean_us)
    d_i = F.round(
        F.greatest(
            i.cast("double") / n - f_exp,
            f_exp - (i - 1).cast("double") / n,
        ),
        6,
    )
    per_gap = gaps.select(
        "event_type",
        n.alias("n_gaps"),
        F.round(mean_us / 1000000.0, 4).alias("mean_gap_s"),
        d_i.alias("_d"),
    )
    return (
        per_gap.groupBy("event_type")
        .agg(
            F.first("n_gaps").alias("n_gaps"),
            F.first("mean_gap_s").alias("mean_gap_s"),
            F.max("_d").alias("ks_stat"),
        )
        .withColumn(
            "reject_exponential",
            F.col("ks_stat") > F.lit(1.36) / F.sqrt(F.col("n_gaps").cast("double")),
        )
        .orderBy("event_type")
    )


KS_EXPFIT_SQL = """
WITH g AS (
  SELECT event_type, event_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
), gaps AS (
  SELECT event_type, event_id, gap_us FROM g
  WHERE gap_us IS NOT NULL AND gap_us > 0
), stats AS (
  SELECT event_type, event_id, gap_us,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(gap_us) OVER (PARTITION BY event_type) AS DOUBLE)
           / count(*) OVER (PARTITION BY event_type) AS mean_us,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY gap_us, event_id) AS i
  FROM gaps
), steps AS (
  SELECT event_type, n, mean_us,
         round(greatest(
           CAST(i AS DOUBLE) / n - (1.0 - exp(-CAST(gap_us AS DOUBLE) / mean_us)),
           (1.0 - exp(-CAST(gap_us AS DOUBLE) / mean_us)) - CAST(i - 1 AS DOUBLE) / n
         ), 6) AS d
  FROM stats
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_gaps,
       round(max(mean_us) / 1000000.0, 4) AS mean_gap_s,
       max(d) AS ks_stat,
       max(d) > 1.36 / sqrt(CAST(max(n) AS DOUBLE)) AS reject_exponential
FROM steps
GROUP BY event_type
ORDER BY event_type
"""


# defaults shared with DECAYED_TOPK_SQL below — the oracle is derived
# from THESE constants, so the Python default and the certified SQL can
# never silently diverge (r9 review finding)
_DECAYED_HALF_LIFE_HOURS = 24.0
_DECAYED_TOPK_K = 10


def decayed_event_type_topk(
    spark: SparkSession,
    sf_dir: str,
    half_life_hours: float = _DECAYED_HALF_LIFE_HOURS,
    k: int = _DECAYED_TOPK_K,
) -> DataFrame:
    """Exponential-decay weighted top-k event types — the batch, oracle-
    certifiable counterpart of `streaming.stateful.decayed_heavy_hitters`
    (same decay law, same "fresh beats stale" ranking): each event
    contributes 0.5^(Δt / half_life) of weight, anchored at the corpus
    max event time, so a type that stopped firing hours ago ranks below
    a type bursting now even when its raw count is higher.

    Exactness: the decay term is a libm pow whose last ulp can differ
    between engines — each term is rounded to 6 dp FIXED-POINT (×10⁶ →
    round → long) before the sum, so the aggregate is an exact integer
    sum in both engines (the engine-wide convention; the KS exp fit and
    the calibration means use the same trick). Δt is exact integer
    microseconds (timestampdiff / date_diff 'microsecond').

    Scale shape: one events scan → map-side decay expression → hash
    aggregate on event_type → TakeOrdered k. The anchor max-ts is a
    1-row broadcast (the allowlisted scalar shape). Fixed-point sums
    hold to ~10¹² events per type before approaching int64 range
    (each term ≤ 10⁶)."""
    half_life_us = int(half_life_hours * 3600 * 1_000_000)
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    mx = ev.agg(F.max("ts").alias("t_max"))
    term = F.pow(
        F.lit(0.5),
        F.expr("timestampdiff(MICROSECOND, ts, t_max)").cast("double")
        / F.lit(float(half_life_us)),
    )
    fixed = F.round(term * 1000000, 0).cast("long")
    return (
        ev.join(F.broadcast(mx))
        .select("event_type", fixed.alias("_fx"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("_fx") / 1000000.0, 6).alias("decayed_weight"),
        )
        .orderBy(F.desc("decayed_weight"), "event_type")
        .limit(k)
    )


DECAYED_TOPK_SQL = f"""
WITH mx AS (SELECT max(ts) AS t_max FROM events),
w AS (
  SELECT event_type,
         CAST(round(power(0.5,
                CAST(date_diff('microsecond', ts, t_max) AS DOUBLE)
                  / {_DECAYED_HALF_LIFE_HOURS * 3600 * 1_000_000:.1f}) * 1000000,
              0) AS BIGINT) AS fx
  FROM events CROSS JOIN mx
)
SELECT event_type,
       count(*) AS n_events,
       round(CAST(sum(fx) AS BIGINT) / 1000000.0, 6) AS decayed_weight
FROM w
GROUP BY event_type
ORDER BY decayed_weight DESC, event_type
LIMIT {_DECAYED_TOPK_K}
"""


def changepoint_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single best changepoint per priority class over the daily order-count
    series — binary segmentation's first split: the day boundary that
    maximizes the standardized two-sample mean-shift statistic
    ``T_i² = D_i² / (i·(n−i)·n)`` with ``D_i = S_i·n − i·S_n`` (S = prefix
    sum of counts). The complement to :func:`cusum_daily_orders`: CUSUM
    flags that a sustained shift EXISTS; this localizes WHERE the level
    changed and by how much — the "what day did the mix break" question an
    ingest monitor answers before diffing upstream configs.

    Exactness across engines: D_i is exact integer arithmetic on prefix
    sums (no means until the very end); D_i itself grows as
    total_orders·days, so an int64 SQUARE would overflow at ~3·10⁹
    order-days (r10 review — the gini n²-class bound): D_i is cast to
    double BEFORE squaring on both engines — the score is a ranking
    key needing ~15 significant digits, and both engines square the
    identical double, so the argmax (score desc, date asc) still breaks
    ties deterministically.

    Scale shape: one orders scan → hash aggregate to (priority, day)
    cardinality, then ordered windows over the TINY daily series — the
    windows never see fact rows. Interior splits only (1 ≤ i < n)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderpriority", "o_orderdate").agg(
        F.count(F.lit(1)).alias("n")
    )
    wg = Window.partitionBy("o_orderpriority")
    w_ord = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        daily.withColumn("s_i", F.sum("n").over(w_ord))
        .withColumn("i", F.row_number().over(wg.orderBy("o_orderdate")))
        .withColumn("n_days", F.count(F.lit(1)).over(wg))
        .withColumn("s_n", F.sum("n").over(wg))
        .filter(F.col("i") < F.col("n_days"))
        .withColumn("d_i", F.col("s_i") * F.col("n_days") - F.col("i") * F.col("s_n"))
        .withColumn(
            "score",
            F.col("d_i").cast("double") * F.col("d_i").cast("double")
            / (F.col("i") * (F.col("n_days") - F.col("i"))).cast("double"),
        )
    )
    best = scored.withColumn(
        "rk",
        F.row_number().over(wg.orderBy(F.desc("score"), F.asc("o_orderdate"))),
    ).filter(F.col("rk") == 1)
    return best.select(
        "o_orderpriority",
        F.col("o_orderdate").alias("split_date"),
        F.col("i").alias("n_left"),
        (F.col("n_days") - F.col("i")).alias("n_right"),
        F.round(F.col("s_i") / F.col("i"), 6).alias("mean_left"),
        F.round(
            (F.col("s_n") - F.col("s_i")) / (F.col("n_days") - F.col("i")), 6
        ).alias("mean_right"),
        F.round(
            F.sqrt(F.col("score") / F.col("n_days").cast("double")), 6
        ).alias("shift_tstat"),
    ).orderBy("o_orderpriority")


CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT o_orderpriority, o_orderdate, count(*) AS n
  FROM orders GROUP BY 1, 2
), scored AS (
  SELECT o_orderpriority, o_orderdate, n,
         sum(n) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS i,
         count(*) OVER (PARTITION BY o_orderpriority) AS n_days,
         sum(n) OVER (PARTITION BY o_orderpriority) AS s_n
  FROM daily
), interior AS (
  SELECT *, s_i * n_days - i * s_n AS d_i,
         CAST(d_i AS DOUBLE) * CAST(d_i AS DOUBLE)
           / CAST(i * (n_days - i) AS DOUBLE) AS score
  FROM scored WHERE i < n_days
), best AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY score DESC, o_orderdate) AS rk
  FROM interior
)
SELECT o_orderpriority,
       o_orderdate AS split_date,
       i AS n_left,
       n_days - i AS n_right,
       round(s_i / i, 6) AS mean_left,
       round((s_n - s_i) / (n_days - i), 6) AS mean_right,
       round(sqrt(score / CAST(n_days AS DOUBLE)), 6) AS shift_tstat
FROM best WHERE rk = 1
ORDER BY o_orderpriority
"""


def _daily_orders_dense(spark: SparkSession, sf_dir: str):
    """Shared calendar-densified daily order-count series: one orders
    scan → hash aggregate to day cardinality → full-calendar explode
    with missing days materialized as 0-count rows. Returns
    ``(dense, bounds)`` — dense is (d, n), bounds the 1-row
    (t0, t1) frame (the allowlisted scalar broadcast). THE one
    densification (r9 review: forecast backtest and the ACF each
    rebuilt it; a calendar bug fix must land exactly here)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = daily.agg(F.min("d").alias("t0"), F.max("d").alias("t1"))
    cal = bounds.select(
        F.explode(F.expr("sequence(t0, t1, interval 1 day)")).alias("d")
    )
    dense = cal.join(daily, "d", "left").select(
        "d", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    return dense, bounds


# the SQL mirror of _daily_orders_dense — shared verbatim by
# FORECAST_BACKTEST_SQL and ACF_SQL
_DAILY_DENSE_CTES = """daily AS (
  SELECT o_orderdate AS d, count(*) AS n FROM orders GROUP BY 1
), bounds AS (
  SELECT min(d) AS t0, max(d) AS t1 FROM daily
), cal AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS d FROM bounds
), dense AS (
  SELECT cal.d, COALESCE(daily.n, 0) AS n
  FROM cal LEFT JOIN daily ON cal.d = daily.d
)"""


def forecast_backtest_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead forecast backtest over the CALENDAR-densified daily
    order-count series: three standard baselines — naive (yesterday),
    seasonal-naive (same weekday last week), and a trailing 7-day moving
    average — each scored by MAE, RMSE, and signed bias over every day
    where all three predictors exist. This is the sanity table a capacity
    planner reads before trusting any fancier model: if it can't beat
    seasonal-naive, the seasonality IS the forecast.

    The series is densified over the full calendar span (missing days
    count 0) so "yesterday" and "last week" are calendar lags, not
    previous-observed-row lags — a gap day would otherwise silently
    shift every seasonal prediction off its weekday.

    Exactness across engines: all errors are scaled ×7 so the MA7 error
    ``|7·actual − Σ₇|`` is exact integer arithmetic (no mean until the
    final division); MAE/bias divide one exact int64 sum, RMSE is
    sqrt (IEEE exactly-rounded) of one exact ratio. Squared-error sums
    stay within int64 to ~10⁶ orders/day over 10⁴ days; past that promote
    the square to double (RMSE is a diagnostic, not a ranking key).

    Scale shape: one orders scan → hash aggregate to day cardinality; the
    calendar explode, windows, and metric stack all run on the tiny daily
    series. The date-bounds row is the allowlisted 1-row broadcast."""
    dense, _ = _daily_orders_dense(spark, sf_dir)
    w = Window.orderBy("d")
    w7 = Window.orderBy("d").rowsBetween(-7, -1)
    ev = (
        dense.withColumn("rn", F.row_number().over(w))
        .withColumn("lag1", F.lag("n", 1).over(w))
        .withColumn("lag7", F.lag("n", 7).over(w))
        .withColumn("sum7", F.sum("n").over(w7))
        .filter(F.col("rn") > 7)
    )
    e_naive = (F.col("n") - F.col("lag1")) * 7
    e_snaive = (F.col("n") - F.col("lag7")) * 7
    e_ma7 = F.col("n") * 7 - F.col("sum7")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(e_naive)).alias("ae_n"),
        F.sum(e_naive * e_naive).alias("se_n"),
        F.sum(e_naive).alias("b_n"),
        F.sum(F.abs(e_snaive)).alias("ae_s"),
        F.sum(e_snaive * e_snaive).alias("se_s"),
        F.sum(e_snaive).alias("b_s"),
        F.sum(F.abs(e_ma7)).alias("ae_m"),
        F.sum(e_ma7 * e_ma7).alias("se_m"),
        F.sum(e_ma7).alias("b_m"),
    )
    stacked = agg.select(
        "n_days",
        F.expr(
            "stack(3, 'ma7', ae_m, se_m, b_m,"
            " 'naive', ae_n, se_n, b_n,"
            " 'seasonal_naive', ae_s, se_s, b_s)"
            " AS (method, ae, se, b)"
        ),
    )
    return stacked.select(
        "method",
        "n_days",
        F.round(F.col("ae") / (7.0 * F.col("n_days")), 6).alias("mae"),
        F.round(F.sqrt(F.col("se") / (49.0 * F.col("n_days"))), 6).alias("rmse"),
        F.round(F.col("b") / (7.0 * F.col("n_days")), 6).alias("bias"),
    ).orderBy("method")


FORECAST_BACKTEST_SQL = f"""
WITH {_DAILY_DENSE_CTES}, ev AS (
  SELECT *,
         row_number() OVER (ORDER BY d) AS rn,
         lag(n, 1) OVER (ORDER BY d) AS lag1,
         lag(n, 7) OVER (ORDER BY d) AS lag7,
         sum(n) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sum7
  FROM dense
), err AS (
  SELECT (n - lag1) * 7 AS e_n, (n - lag7) * 7 AS e_s, n * 7 - sum7 AS e_m
  FROM ev WHERE rn > 7
), agg AS (
  SELECT count(*) AS n_days,
         CAST(sum(abs(e_n)) AS BIGINT) AS ae_n, CAST(sum(e_n * e_n) AS BIGINT) AS se_n,
         CAST(sum(e_n) AS BIGINT) AS b_n,
         CAST(sum(abs(e_s)) AS BIGINT) AS ae_s, CAST(sum(e_s * e_s) AS BIGINT) AS se_s,
         CAST(sum(e_s) AS BIGINT) AS b_s,
         CAST(sum(abs(e_m)) AS BIGINT) AS ae_m, CAST(sum(e_m * e_m) AS BIGINT) AS se_m,
         CAST(sum(e_m) AS BIGINT) AS b_m
  FROM err
), stacked AS (
  SELECT 'ma7' AS method, n_days, ae_m AS ae, se_m AS se, b_m AS b FROM agg
  UNION ALL
  SELECT 'naive', n_days, ae_n, se_n, b_n FROM agg
  UNION ALL
  SELECT 'seasonal_naive', n_days, ae_s, se_s, b_s FROM agg
)
SELECT method, n_days,
       round(ae / (7.0 * n_days), 6) AS mae,
       round(sqrt(se / (49.0 * n_days)), 6) AS rmse,
       round(b / (7.0 * n_days), 6) AS bias
FROM stacked
ORDER BY method
"""


# max lag shared with ACF_SQL below — the oracle is derived from THIS
# constant (the decayed-topk convention: Python default and certified SQL
# cannot silently diverge)
_ACF_MAX_LAG = 14


def acf_daily_orders(
    spark: SparkSession, sf_dir: str, max_lag: int = _ACF_MAX_LAG
) -> DataFrame:
    """Autocorrelation function of the calendar-densified daily order-count
    series at lags 1..``max_lag``: the spectrum a scheduler reads to pick
    the seasonal period (a weekly cycle shows as a lag-7 spike) and the
    plot that justifies — or kills — the seasonal-naive baseline in
    :func:`forecast_backtest_daily_orders`.

    Each lag's Pearson r is assembled from exact int64 sums (n, Σx, Σy,
    Σxy, Σx², Σy²) over the lag-aligned pairs, so the only floating-point
    steps are one fused expression of exactly-represented integers — both
    engines round identically. Zero-variance sides yield NULL (guarded),
    never NaN. Σxy stays in int64 to ~3·10⁹ orders/day over 10⁴ days.

    Scale shape: one orders scan → hash aggregate to day cardinality; the
    lag alignment is an integer-key self-join of the TINY daily series
    against a ``max_lag``-row lag grid (day_idx = day_idx − k), a hash
    join on exact integers — no window state, no fact-row windows. The
    date-bounds row is the allowlisted 1-row broadcast. Every requested
    lag is materialized: a lag longer than the series reports
    (n_pairs 0, acf NULL) instead of silently vanishing (the
    zero-cell-grid convention)."""
    dense0, bounds = _daily_orders_dense(spark, sf_dir)
    dense = dense0.join(F.broadcast(bounds.select("t0"))).select(
        F.datediff(F.col("d"), F.col("t0")).alias("idx"),
        F.col("n"),
    )
    lags = spark.range(1, max_lag + 1).select(F.col("id").cast("int").alias("lag"))
    x = dense.select(F.col("idx").alias("ix"), F.col("n").alias("xv"))
    y = dense.select(F.col("idx").alias("iy"), F.col("n").alias("yv"))
    pairs = (
        x.join(F.broadcast(lags))
        .withColumn("iy", F.col("ix") - F.col("lag"))
        .join(y, "iy")
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    # lags beyond the series length have zero pairs and VANISH from the
    # groupBy (the chi²-zero-cell trap) — re-join the full lag grid so a
    # missing lag reads as (n_pairs 0, acf NULL), never as an absent row
    full = lags.join(agg, "lag", "left")
    vx = full["n_pairs"] * full["sxx"] - full["sx"] * full["sx"]
    vy = full["n_pairs"] * full["syy"] - full["sy"] * full["sy"]
    num = (full["n_pairs"] * full["sxy"] - full["sx"] * full["sy"]).cast("double")
    return full.select(
        "lag",
        F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / F.sqrt(vx.cast("double") * vy.cast("double")), 6),
        ).alias("acf"),
    ).orderBy("lag")


ACF_SQL = f"""
WITH {_DAILY_DENSE_CTES}, idxed AS (
  SELECT CAST(date_diff('day', bounds.t0, dense.d) AS INTEGER) AS idx, n
  FROM dense CROSS JOIN bounds
), lags AS (
  SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag
), pairs AS (
  SELECT lags.lag, x.n AS xv, y.n AS yv
  FROM idxed x CROSS JOIN lags JOIN idxed y ON y.idx = x.idx - lags.lag
), agg AS (
  SELECT lag, count(*) AS n_pairs,
         CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         CAST(sum(xv * yv) AS BIGINT) AS sxy,
         CAST(sum(xv * xv) AS BIGINT) AS sxx,
         CAST(sum(yv * yv) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lags.lag AS INTEGER) AS lag,
       COALESCE(n_pairs, 0) AS n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
            THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                              * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
       END AS acf
FROM lags LEFT JOIN agg ON lags.lag = agg.lag
ORDER BY 1
"""


def weekly_value_quantile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly p50/p90/p99 of the event ``value`` per event type, with the
    week-over-week median delta — the quantile-band trend a telemetry
    dashboard plots to separate "the median moved" (systematic change)
    from "the tail moved" (a new outlier population), which single-number
    trends (mean, max) conflate.

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` compute
    the same linear-interpolated order statistic (the certified
    percentiles convention), rounded to 4 dp; week bucketing is ISO
    Monday ``date_trunc('week')`` on both engines; the delta is a lag
    window over the tiny (week × type) relation, NULL on each type's
    first week.

    Scale shape: one events scan → exact percentile per (week, type)
    group — a sort per group, the certified exact default; at whale
    (week × type) cardinalities the house scale path is
    ``approx_percentile`` (mergeable KLL-style summaries, map-side
    combinable — the percentiles_order_value convention, error-bounded
    in tests there). The trailing lag runs on aggregate-sized rows."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).alias("week_start"),
        "event_type",
        "value",
    )
    agg = ev.groupBy("week_start", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )
    w = Window.partitionBy("event_type").orderBy("week_start")
    return agg.withColumn(
        "p50_delta", F.round(F.col("p50") - F.lag("p50", 1).over(w), 4)
    ).orderBy("week_start", "event_type")


WEEKLY_QUANTILE_TREND_SQL = """
WITH agg AS (
  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start, event_type,
         count(*) AS n_events,
         round(quantile_cont(value, 0.5), 4) AS p50,
         round(quantile_cont(value, 0.9), 4) AS p90,
         round(quantile_cont(value, 0.99), 4) AS p99
  FROM events GROUP BY 1, 2
)
SELECT week_start, event_type, n_events, p50, p90, p99,
       round(p50 - lag(p50, 1) OVER (PARTITION BY event_type
                                     ORDER BY week_start), 4) AS p50_delta
FROM agg
ORDER BY week_start, event_type
"""


def seasonal_residual_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint scan over the SEASONAL-NAIVE RESIDUALS of the daily
    order-count series (VERDICT r9 #7 — the composition of two certified
    r9 ops): residual r_t = n_t − n_{t−7} over the calendar-densified
    series strips the weekly cycle that
    :func:`forecast_backtest_daily_orders` certified as the best
    baseline, and the binary-segmentation first split of
    :func:`changepoint_daily_orders` then runs on what REMAINS — so a
    level shift in the de-seasonalized process is localized without the
    weekly pattern masquerading as the change. The "did the process
    change, or is it just Tuesday" monitor.

    Exactness across engines: residuals are exact int64 differences over
    the shared dense calendar (:func:`_daily_orders_dense` — missing days
    are real 0-count rows, so lag-7 is a true calendar week); the split
    statistic D_i = S_i·m − i·S_m is exact integer prefix-sum arithmetic;
    D_i is cast to double BEFORE squaring on both engines (an int64
    square overflows at ~3·10⁹ residual-mass·days — the parent op's r10
    review fix, same n²-class bound as the ginis), and the argmax breaks
    ties by (score desc, date asc) over the identically-computed double.

    Scale shape: one orders scan → day-cardinality hash aggregate; every
    window (lag, prefix sum, rank) runs over the TINY daily series, fact
    rows never enter a sort."""
    dense, _ = _daily_orders_dense(spark, sf_dir)
    w = Window.orderBy("d")
    res = (
        dense.withColumn("rn", F.row_number().over(w))
        .withColumn("lag7", F.lag("n", 7).over(w))
        .filter(F.col("rn") > 7)
        .select("d", (F.col("n") - F.col("lag7")).alias("r"))
    )
    wg = Window.partitionBy()
    w_ord = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = (
        res.withColumn("s_i", F.sum("r").over(w_ord))
        .withColumn("i", F.row_number().over(Window.orderBy("d")))
        .withColumn("m", F.count(F.lit(1)).over(wg))
        .withColumn("s_m", F.sum("r").over(wg))
        .filter(F.col("i") < F.col("m"))
        .withColumn("d_i", F.col("s_i") * F.col("m") - F.col("i") * F.col("s_m"))
        .withColumn(
            "score",
            F.col("d_i").cast("double") * F.col("d_i").cast("double")
            / (F.col("i") * (F.col("m") - F.col("i"))).cast("double"),
        )
    )
    best = scored.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("d")))
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("d").alias("split_date"),
        F.col("i").alias("n_left"),
        (F.col("m") - F.col("i")).alias("n_right"),
        F.round(F.col("s_i") / F.col("i"), 6).alias("mean_resid_left"),
        F.round((F.col("s_m") - F.col("s_i")) / (F.col("m") - F.col("i")), 6).alias(
            "mean_resid_right"
        ),
        F.round(F.sqrt(F.col("score") / F.col("m").cast("double")), 6).alias(
            "shift_tstat"
        ),
    )


SEASONAL_RESIDUAL_CHANGEPOINT_SQL = f"""
WITH {_DAILY_DENSE_CTES}, res AS (
  SELECT d, r FROM (
    SELECT d,
           row_number() OVER (ORDER BY d) AS rn,
           n - lag(n, 7) OVER (ORDER BY d) AS r
    FROM dense
  ) WHERE rn > 7
), scored AS (
  SELECT d, r,
         sum(r) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
         row_number() OVER (ORDER BY d) AS i,
         count(*) OVER () AS m,
         sum(r) OVER () AS s_m
  FROM res
), interior AS (
  SELECT *, s_i * m - i * s_m AS d_i,
         CAST(s_i * m - i * s_m AS DOUBLE) * CAST(s_i * m - i * s_m AS DOUBLE)
           / CAST(i * (m - i) AS DOUBLE) AS score
  FROM scored WHERE i < m
), best AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, d) AS rk FROM interior
)
SELECT d AS split_date,
       i AS n_left,
       m - i AS n_right,
       round(s_i / i, 6) AS mean_resid_left,
       round((s_m - s_i) / (m - i), 6) AS mean_resid_right,
       round(sqrt(score / CAST(m AS DOUBLE)), 6) AS shift_tstat
FROM best WHERE rk = 1
"""


def seasonality_strength_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekly-seasonality strength of daily order volume per priority
    class: the share of daily-count variance explained by a
    day-of-week-means fit — eta² = (Σ_g S_g²/n_g − S²/n) / (SS − S²/n)
    over the 7 day-of-week groups g. The readout that justifies (or
    kills) weekly-seasonal models per segment: strength ≈ 0 says the
    seasonal-naive baseline of :func:`forecast_backtest_daily_orders`
    buys nothing for that priority; ≈ 1 says day-of-week IS the signal.

    The calendar is densified PER PRIORITY over that priority's own
    active range (missing days are real 0-count rows — omitting them
    would overstate strength whenever inactivity clusters on weekends,
    the zero-cell lesson applied to time). Day-of-week is engine-free
    integer arithmetic: days-since-1970-01-01 mod 7 (never an engine
    dayofweek builtin — Spark counts Sunday=1, DuckDB Sunday=0).

    Exactness: per-(priority, dow) accumulators (n_g, S_g, Σn²) are
    exact int64; each S_g²/n_g is one double division of exact operands
    and the 7-term sum's ordering ulps are erased by the 6 dp round
    (house float-agg rule). Degenerate series (SS_total = 0: constant
    daily counts) report NULL strength, never NaN.

    Scale shape: one orders scan → (priority, day) hash agg; the
    densify/window work runs on the tiny daily relation (|priorities| ×
    days rows); output is |priorities| rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderpriority", F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    b = daily.groupBy("o_orderpriority").agg(
        F.min("d").alias("t0"), F.max("d").alias("t1")
    )
    cal = b.select(
        "o_orderpriority",
        F.explode(F.expr("sequence(t0, t1, interval 1 day)")).alias("d"),
    )
    dense = cal.join(daily, ["o_orderpriority", "d"], "left").select(
        "o_orderpriority",
        "d",
        F.coalesce("n", F.lit(0).cast("long")).alias("n"),
    )
    dow = F.expr("datediff(CAST(d AS DATE), DATE '1970-01-01') % 7")
    per_dow = dense.groupBy("o_orderpriority", dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("n").alias("s_g"),
        F.sum(F.col("n") * F.col("n")).alias("ss_g"),
    )
    per = per_dow.groupBy("o_orderpriority").agg(
        F.sum("n_g").alias("n_days"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(
            F.col("s_g").cast("double") * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("fit_ss"),
    )
    grand = (
        F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n_days").cast("double")
    )
    ss_total = F.col("ss").cast("double") - grand
    between = F.col("fit_ss") - grand
    return per.select(
        "o_orderpriority",
        "n_days",
        F.round(F.col("s").cast("double") / F.col("n_days"), 6).alias(
            "mean_daily"
        ),
        F.when(ss_total > 0, F.round(between / ss_total, 6)).alias(
            "seasonality_strength"
        ),
    ).orderBy("o_orderpriority")


SEASONALITY_STRENGTH_SQL = """
WITH daily AS (
  SELECT o_orderpriority, o_orderdate AS d, count(*) AS n
  FROM orders GROUP BY 1, 2
), b AS (
  SELECT o_orderpriority, min(d) AS t0, max(d) AS t1 FROM daily GROUP BY 1
), cal AS (
  SELECT o_orderpriority,
         unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS d
  FROM b
), dense AS (
  SELECT cal.o_orderpriority, cal.d, COALESCE(daily.n, 0) AS n
  FROM cal LEFT JOIN daily
    ON daily.o_orderpriority = cal.o_orderpriority AND daily.d = cal.d
), per_dow AS (
  SELECT o_orderpriority,
         date_diff('day', DATE '1970-01-01', CAST(d AS DATE)) % 7 AS dow,
         count(*) AS n_g,
         CAST(sum(n) AS BIGINT) AS s_g,
         CAST(sum(n * n) AS BIGINT) AS ss_g
  FROM dense GROUP BY 1, 2
), per AS (
  SELECT o_orderpriority,
         CAST(sum(n_g) AS BIGINT) AS n_days,
         CAST(sum(s_g) AS BIGINT) AS s,
         CAST(sum(ss_g) AS BIGINT) AS ss,
         sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
           AS fit_ss
  FROM per_dow GROUP BY 1
)
SELECT o_orderpriority, n_days,
       round(CAST(s AS DOUBLE) / n_days, 6) AS mean_daily,
       CASE WHEN CAST(ss AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_days > 0
            THEN round(
              (fit_ss - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_days)
              / (CAST(ss AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_days), 6)
       END AS seasonality_strength
FROM per
ORDER BY o_orderpriority
"""


def weekly_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention triangle over events: users are cohorted
    by their FIRST active week; for every (cohort_week, week_offset)
    cell, the share of the cohort active that many weeks later. THE
    growth-accounting table — a product change shows as a vertical
    stripe, cohort-quality drift as rows that start lower.

    Weeks are engine-free integers (days-since-1970-01-01 div 7 — never
    date_trunc('week', …), whose return TYPE differs across engines, the
    r9 trap). The triangle is materialized COMPLETE per cohort out to
    the corpus max week (zero-cell rule): a week where a cohort went
    fully silent is an explicit 0-retention row — exactly the cells a
    churn alarm reads, and exactly the ones a groupBy would drop.

    Exactness: counts are exact distinct-(user, week) integers;
    retention is one double division rounded 6 dp; offset-0 retention
    is 1.0 by construction (cohort = first active week).

    Scale shape: one events scan → distinct (user, week) — the only
    user-grain shuffle; cohorts collapse to a weeks-sized relation
    before the explode, so the triangle (≈ weeks²/2 rows) never touches
    event rows. The max-week anchor is the allowlisted 1-row scalar
    broadcast."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7")
    uw = ev.select("user_id", wk.alias("wk")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    act = (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    mx = uw.agg(F.max("wk").alias("max_wk"))
    grid = sizes.join(F.broadcast(mx)).select(
        "cohort_week",
        "n_cohort",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("max_wk") - F.col("cohort_week"))
        ).alias("week_offset"),
    )
    return (
        grid.join(
            act.withColumnRenamed("k", "week_offset"),
            ["cohort_week", "week_offset"],
            "left",
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_cohort",
            F.coalesce("n_active", F.lit(0).cast("long")).alias("n_active"),
            F.round(
                F.coalesce("n_active", F.lit(0).cast("long")).cast("double")
                / F.col("n_cohort"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


WEEKLY_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events
), cohort AS (
  SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1
), act AS (
  SELECT c.cohort_week, uw.wk - c.cohort_week AS week_offset,
         count(*) AS n_active
  FROM uw JOIN cohort c USING (user_id)
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, count(*) AS n_cohort FROM cohort GROUP BY 1
), mx AS (SELECT max(wk) AS max_wk FROM uw),
grid AS (
  SELECT s.cohort_week, s.n_cohort,
         unnest(generate_series(0, mx.max_wk - s.cohort_week)) AS week_offset
  FROM sizes s CROSS JOIN mx
)
SELECT g.cohort_week, g.week_offset, g.n_cohort,
       COALESCE(a.n_active, 0) AS n_active,
       round(CAST(COALESCE(a.n_active, 0) AS DOUBLE) / g.n_cohort, 6)
         AS retention
FROM grid g
LEFT JOIN act a
  ON a.cohort_week = g.cohort_week AND a.week_offset = g.week_offset
ORDER BY g.cohort_week, g.week_offset
"""


def user_lifecycle_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth-accounting matrix over events — the state-machine
    companion to :func:`weekly_retention_matrix`: every active (user,
    week) is classified NEW (first week ever), RETAINED (active the
    immediately previous week) or RESURRECTED (active before, but not
    last week), and every (user active in w, silent in w+1) contributes
    a CHURNED count to week w+1. The four columns are the standard
    growth-accounting identity — n_active(w) = n_active(w−1) + n_new +
    n_resurrected − n_churned — which a health dashboard reads as "is
    growth new users or resurrection, and is churn eating it".

    Weeks are engine-free integers (days-since-1970-01-01 div 7, the
    house convention — never date_trunc/weekofyear). The week grid is
    dense from the corpus min to max week (zero-cell rule: a fully
    silent week is an explicit all-zero row — with its churn count from
    the week before — never a missing row). Churn past the corpus max
    week is unknowable and excluded by the grid.

    Exactness: pure exact integer counts over distinct (user, week) —
    no floats anywhere.

    Scale shape: one events scan → distinct (user, week) — the only
    user-grain shuffle; the lag/lead window runs per user on that
    deduplicated relation; everything after collapses to |weeks| rows.
    The min/max anchor is the allowlisted 1-row scalar broadcast."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7")
    uw = ev.select("user_id", wk.alias("wk")).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    st = uw.select(
        "wk",
        F.lag("wk").over(w).alias("lag_wk"),
        F.lead("wk").over(w).alias("lead_wk"),
    )
    per = st.groupBy("wk").agg(
        F.sum(F.when(F.col("lag_wk").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("lag_wk") == F.col("wk") - 1, 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("lag_wk").isNotNull()
                & (F.col("lag_wk") < F.col("wk") - 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    churn = (
        st.filter(
            F.col("lead_wk").isNull() | (F.col("lead_wk") > F.col("wk") + 1)
        )
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    grid = (
        uw.agg(F.min("wk").alias("mn"), F.max("wk").alias("mx"))
        .select(F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("wk"))
    )
    z = F.lit(0).cast("long")
    return (
        grid.join(per, "wk", "left")
        .join(churn, "wk", "left")
        .select(
            "wk",
            F.coalesce("n_new", z).alias("n_new"),
            F.coalesce("n_retained", z).alias("n_retained"),
            F.coalesce("n_resurrected", z).alias("n_resurrected"),
            (
                F.coalesce("n_new", z)
                + F.coalesce("n_retained", z)
                + F.coalesce("n_resurrected", z)
            ).alias("n_active"),
            F.coalesce("n_churned", z).alias("n_churned"),
        )
        .orderBy("wk")
    )


USER_LIFECYCLE_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events
), st AS (
  SELECT wk,
         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS lag_wk,
         lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS lead_wk
  FROM uw
), per AS (
  SELECT wk,
         CAST(sum(CASE WHEN lag_wk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN lag_wk = wk - 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(sum(CASE WHEN lag_wk IS NOT NULL AND lag_wk < wk - 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM st GROUP BY 1
), churn AS (
  SELECT wk + 1 AS wk, CAST(count(*) AS BIGINT) AS n_churned
  FROM st WHERE lead_wk IS NULL OR lead_wk > wk + 1
  GROUP BY 1
), grid AS (
  SELECT unnest(generate_series(mn, mx)) AS wk
  FROM (SELECT min(wk) AS mn, max(wk) AS mx FROM uw)
)
SELECT g.wk,
       COALESCE(p.n_new, 0) AS n_new,
       COALESCE(p.n_retained, 0) AS n_retained,
       COALESCE(p.n_resurrected, 0) AS n_resurrected,
       COALESCE(p.n_new, 0) + COALESCE(p.n_retained, 0)
         + COALESCE(p.n_resurrected, 0) AS n_active,
       COALESCE(c.n_churned, 0) AS n_churned
FROM grid g
LEFT JOIN per p USING (wk)
LEFT JOIN churn c USING (wk)
ORDER BY g.wk
"""


# the p-chart's monitored class and control width, shared by the Spark
# chain and PRIORITY_PCHART_SQL below so oracle parity holds at ANY
# default change (the DEDUP_TOKEN_BUDGET_SQL interpolation convention) —
# non-default call sites remain uncertified and should say so
_PCHART_PRIORITY = "1-URGENT"
_PCHART_K_SIGMA = 3.0


def priority_share_control_chart(
    spark: SparkSession,
    sf_dir: str,
    priority: str = _PCHART_PRIORITY,
    k_sigma: float = _PCHART_K_SIGMA,
) -> DataFrame:
    """Shewhart p-chart over the weekly share of ``priority`` orders —
    the control-chart member of the drift family: where
    :func:`operators.profile.priority_mix_drift_by_month` scores a whole
    mix against the corpus, the p-chart answers the operational question
    "is THIS week's urgent share outside common-cause variation?" with
    the classic binomial 3σ limits around the corpus share p̄:
    UCL/LCL = p̄ ± k·√(p̄(1−p̄)/n_w), clamped to [0, 1], where n_w is the
    week's own order count (limits widen exactly where weeks are thin).

    Weeks are engine-free integers (days-since-1970-01-01 div 7).

    Exactness: counts exact int64, each cast to double once; the
    out-of-control flag compares 9 dp-ROUNDED share and limits (the
    house ulp rule — a share sitting ON a limit must flag identically
    in both engines); reported ratios round 6 dp.

    Scale shape: one orders scan → |weeks|-row hash aggregate; p̄ is the
    allowlisted 1-row scalar broadcast; everything after runs on the
    |weeks|-row relation."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') div 7"
        ).alias("wk"),
        (F.col("o_orderpriority") == priority).cast("long").alias("hit"),
    )
    per = o.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("hit").alias("n_hit")
    )
    tot = per.agg(
        (
            F.sum("n_hit").cast("double") / F.sum("n_orders").cast("double")
        ).alias("pbar")
    )
    j = per.join(F.broadcast(tot))
    share = F.col("n_hit").cast("double") / F.col("n_orders").cast("double")
    sigma = F.sqrt(
        F.col("pbar") * (1.0 - F.col("pbar")) / F.col("n_orders").cast("double")
    )
    ucl = F.least(F.col("pbar") + k_sigma * sigma, F.lit(1.0))
    lcl = F.greatest(F.col("pbar") - k_sigma * sigma, F.lit(0.0))
    flag = (F.round(share, 9) > F.round(ucl, 9)) | (
        F.round(share, 9) < F.round(lcl, 9)
    )
    return j.select(
        "wk",
        "n_orders",
        "n_hit",
        F.round(share, 6).alias("share"),
        F.round("pbar", 6).alias("center"),
        F.round(lcl, 6).alias("lcl"),
        F.round(ucl, 6).alias("ucl"),
        flag.alias("out_of_control"),
    ).orderBy("wk")


PRIORITY_PCHART_SQL = f"""
WITH o AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7
           AS wk,
         CASE WHEN o_orderpriority = '{_PCHART_PRIORITY}' THEN 1 ELSE 0 END
           AS hit
  FROM orders
), per AS (
  SELECT wk, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(hit) AS BIGINT) AS n_hit
  FROM o GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_hit) AS DOUBLE) / CAST(sum(n_orders) AS DOUBLE) AS pbar
  FROM per
), j AS (
  SELECT wk, n_orders, n_hit,
         CAST(n_hit AS DOUBLE) / CAST(n_orders AS DOUBLE) AS share,
         pbar,
         least(pbar + {_PCHART_K_SIGMA!r} * sqrt(pbar * (1.0 - pbar)
                                 / CAST(n_orders AS DOUBLE)), 1.0) AS ucl,
         greatest(pbar - {_PCHART_K_SIGMA!r} * sqrt(pbar * (1.0 - pbar)
                                    / CAST(n_orders AS DOUBLE)), 0.0) AS lcl
  FROM per CROSS JOIN tot
)
SELECT wk, n_orders, n_hit,
       round(share, 6) AS share,
       round(pbar, 6) AS center,
       round(lcl, 6) AS lcl,
       round(ucl, 6) AS ucl,
       (round(share, 9) > round(ucl, 9) OR round(share, 9) < round(lcl, 9))
         AS out_of_control
FROM j
ORDER BY wk
"""


# --------------------------------------------------------------------------
# Kaplan-Meier inter-order survival (r12)


def km_interorder_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of customer inter-order gaps — the
    censoring-correct answer to "how long until a customer orders
    again": every consecutive-order gap is an observed event, and every
    customer's open gap (last order → corpus end) is a RIGHT-CENSORED
    duration — the tail a naive gap histogram silently drops, biasing
    re-order time low exactly for the loyal-but-slow customers. Per
    distinct event gap t: the risk set, the event count, and
    S(t) = Π (1 − dᵢ/nᵢ) over event gaps ≤ t.

    Day indexes are engine-free integers (days-since-1970-01-01, the
    house convention), so durations are exact int subtractions; order
    within a same-day pair is pinned by o_orderkey. The KM product runs
    as exp(cumsum(ln(1 − d/n))) — the cumulative window sum is ORDERED
    (deterministic fold order on both engines) and the ln/exp ulps sit
    ~6 orders below the 6 dp round (the KL-divergence precedent). A
    risk set exhausted by its own events (d = n, only possible at the
    final gap) would be ln(0): survival pins to exactly 0.0 from that
    row on via an explicit running d=n flag — Spark's ln(0) is NULL
    while DuckDB's is -inf, so the guard is correctness, not cosmetics.

    Scale shape: one orders scan → per-customer lag/lead window (the
    natural customer-key shuffle) → |distinct gaps|-row aggregate; the
    corpus max date is the allowlisted 1-row scalar broadcast and the
    cumulative windows run on the tiny gap table."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
        ).alias("day"),
    )
    maxd = o.agg(F.max("day").alias("max_day"))
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    seq = o.select(
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    events = seq.filter(F.col("prev_day").isNotNull()).select(
        (F.col("day") - F.col("prev_day")).alias("dur"),
        F.lit(1).alias("is_event"),
    )
    censored = (
        seq.filter(F.col("next_day").isNull())
        .join(F.broadcast(maxd))
        .select(
            (F.col("max_day") - F.col("day")).alias("dur"),
            F.lit(0).alias("is_event"),
        )
    )
    durs = events.unionByName(censored)
    per = durs.groupBy("dur").agg(
        F.sum("is_event").alias("d"),
        F.count(F.lit(1)).alias("m"),
    )
    wt = Window.orderBy("dur")
    risk = per.select(
        "dur",
        "d",
        (
            F.sum("m").over(wt.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        ).alias("n_at_risk"),
    ).filter(F.col("d") > 0)
    exhausted = F.max((F.col("d") == F.col("n_at_risk")).cast("int")).over(
        wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lnterm = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.log(
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    cum = F.sum(lnterm).over(
        wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        risk.select(
            F.col("dur").cast("long").alias("t_days"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.round(
                F.when(exhausted == 1, F.lit(0.0)).otherwise(F.exp(cum)), 6
            ).alias("survival"),
        )
        .orderBy("t_days")
    )


KM_SURVIVAL_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders
), mx AS (
  SELECT max(day) AS max_day FROM o
), seq AS (
  SELECT day,
         lag(day) OVER (PARTITION BY o_custkey
                        ORDER BY day, o_orderkey) AS prev_day,
         lead(day) OVER (PARTITION BY o_custkey
                         ORDER BY day, o_orderkey) AS next_day
  FROM o
), durs AS (
  SELECT day - prev_day AS dur, 1 AS is_event
  FROM seq WHERE prev_day IS NOT NULL
  UNION ALL
  SELECT mx.max_day - seq.day AS dur, 0 AS is_event
  FROM seq CROSS JOIN mx WHERE seq.next_day IS NULL
), per AS (
  SELECT dur, sum(is_event) AS d, count(*) AS m FROM durs GROUP BY 1
), risk AS (
  SELECT dur, d,
         sum(m) OVER (ORDER BY dur
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS n_at_risk
  FROM per
), ev AS (
  SELECT dur, d, n_at_risk,
         max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY dur) AS exhausted,
         sum(CASE WHEN d < n_at_risk
                  THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
                  ELSE 0.0 END)
           OVER (ORDER BY dur) AS cum
  FROM risk WHERE d > 0
)
SELECT CAST(dur AS BIGINT) AS t_days,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       round(CASE WHEN exhausted = 1 THEN 0.0 ELSE exp(cum) END, 6)
         AS survival
FROM ev
ORDER BY t_days
"""


# --------------------------------------------------------------------------
# Order-priority transition matrix (r12)


def priority_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each customer's
    consecutive order priorities — the behavioral readout the
    drift family lacks: :func:`priority_mix_drift_by_month` watches the
    MARGINAL priority mix; this watches the CONDITIONAL step (does an
    urgent order predict the next order's urgency?). A transition row
    far from the marginal mix is exactly the customer-memory signal a
    mixture model of independent orders misses.

    Order within a customer is pinned by (day, o_orderkey) — the KM
    convention for same-day pairs. The |P|×|P| grid is materialized
    from the observed priority set (zero-cell rule: a transition that
    never happens is an explicit 0 row); ``row_share`` row-normalizes
    per source priority and is NULL for a priority never observed as a
    non-terminal order (ANSI zero-division rule, not 0/0).

    Exactness: exact integer counts; one division per cell rounded
    6 dp.

    Scale shape: one orders scan → per-customer lag window (the same
    customer-key shuffle KM pays) → |P|²-row hash aggregate; the grid
    is a crossJoin of two ≤|P|-row distinct frames and every window
    after the aggregate runs on the |P|²-row relation."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
        ).alias("day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    tr = (
        o.select(
            F.lag("o_orderpriority").over(w).alias("from_priority"),
            F.col("o_orderpriority").alias("to_priority"),
        )
        .filter(F.col("from_priority").isNotNull())
        .groupBy("from_priority", "to_priority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    prios = o.select(F.col("o_orderpriority").alias("p")).distinct()
    grid = prios.select(F.col("p").alias("from_priority")).crossJoin(
        prios.select(F.col("p").alias("to_priority"))
    )
    g = grid.join(tr, ["from_priority", "to_priority"], "left").select(
        "from_priority",
        "to_priority",
        F.coalesce("n", F.lit(0)).alias("n"),
    )
    row_total = F.sum("n").over(Window.partitionBy("from_priority"))
    return (
        g.select(
            "from_priority",
            "to_priority",
            F.col("n").cast("long").alias("n_transitions"),
            F.when(
                row_total > 0,
                F.round(F.col("n").cast("double") / row_total, 6),
            ).alias("row_share"),
        )
        .orderBy("from_priority", "to_priority")
    )


PRIORITY_TRANSITION_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderpriority,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders
), tr AS (
  SELECT from_priority, to_priority, count(*) AS n
  FROM (
    SELECT lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                      ORDER BY day, o_orderkey)
             AS from_priority,
           o_orderpriority AS to_priority
    FROM o
  ) s
  WHERE from_priority IS NOT NULL
  GROUP BY 1, 2
), prios AS (
  SELECT DISTINCT o_orderpriority AS p FROM o
), grid AS (
  SELECT a.p AS from_priority, b.p AS to_priority
  FROM prios a CROSS JOIN prios b
), g AS (
  SELECT grid.from_priority, grid.to_priority, COALESCE(tr.n, 0) AS n
  FROM grid LEFT JOIN tr USING (from_priority, to_priority)
)
SELECT from_priority, to_priority,
       CAST(n AS BIGINT) AS n_transitions,
       CASE WHEN sum(n) OVER (PARTITION BY from_priority) > 0
            THEN round(CAST(n AS DOUBLE)
                       / sum(n) OVER (PARTITION BY from_priority), 6)
       END AS row_share
FROM g
ORDER BY from_priority, to_priority
"""
