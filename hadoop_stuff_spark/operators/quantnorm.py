"""Cross-source quantile normalization of model scores — the standard
harmonization when per-source score DISTRIBUTIONS differ (not just their
thresholds, which `scoring.calibrate_scores_by_source` handles with a
percentile cut): each document's within-source rank is mapped onto the
GLOBAL score distribution, so "the 80th-percentile wiki doc" and "the
80th-percentile commoncrawl doc" land on the same normalized value and a
single downstream threshold treats every source fairly.

Mechanics (identical on both engines):
1. within-source percent_rank of the 6 dp oracle-certified model score
   (ties share a rank value, so no tiebreak is needed for the VALUE);
2. a 101-point global quantile grid (exact interpolating percentile —
   Spark `percentile` / DuckDB `quantile_cont`, the portable pair the
   winsorized stats already certify);
3. linear interpolation of the rank into the grid — pure double
   arithmetic on identical operands, rounded to 6 dp.

Scale shape: the rank window shuffles once on source; the grid is ONE
global aggregate row broadcast back (the allowlisted 1-row crossJoin
scalar shape). The exact global percentile sorts score values inside one
aggregate — at 100 TB swap `percentile` for `approx_percentile` at the
marked line (same grid contract, sketch-accurate), which is why the grid
is an explicit materialized step and not fused into the row expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table, spread

_GRID = [i / 100.0 for i in range(101)]


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Add ``norm_score``: ``score_col`` quantile-normalized across
    ``group_col`` onto the global distribution (101-point grid, linear
    interpolation). Input rows pass through unchanged otherwise.

    ``exact=True`` (the oracle-certified default) computes the grid with
    the exact interpolating ``percentile`` — a holistic aggregate that
    sorts the full value set inside one reducer, fine to ~10⁸ values and
    wrong at 100 TB. ``exact=False`` (VERDICT r6 #4 — the 100 TB path)
    swaps in ``approx_percentile`` with the given ``accuracy``: the grid
    comes from a mergeable quantile sketch (one map-side pass, no global
    sort) with rank error ≤ 1/accuracy. The sketch returns an actual
    observation rather than an interpolated value, so grid points differ
    from exact by the local inter-observation gap even below capacity —
    measured norm_score max |Δ| vs exact: 3.6e-4 at sf0.001, 1.6e-4 at
    sf0.1 (accuracy=10,000), shrinking as data densifies the grid.

    ``df`` is consumed at TWO plan sites (the rank window and the grid
    aggregate) — if it carries an expensive upstream (a UDF scoring
    chain, a join), materialize it first (eager localCheckpoint /
    cache), or that upstream runs twice; the registry lint enforces
    this for the certification query. Ties in ``score_col`` share a
    percent_rank and therefore a normalized value — no id tiebreak is
    needed. Raises on input columns colliding with the reserved
    internal names (the score_quality convention)."""
    reserved = {"norm_score", "_pr", "_grid"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"input already has reserved column(s) {sorted(clash)}; "
            "rename them before quantile_normalize"
        )
    w = Window.partitionBy(group_col).orderBy(F.asc(score_col))
    ranked = df.withColumn("_pr", F.percent_rank().over(w))
    grid_ps = F.array(*[F.lit(p) for p in _GRID])
    grid_agg = (
        F.percentile(F.col(score_col), grid_ps)
        if exact
        # the 100 TB path: mergeable sketch, no global sort
        else F.approx_percentile(F.col(score_col), grid_ps, F.lit(accuracy))
    )
    grid = df.agg(grid_agg.cast("array<double>").alias("_grid"))
    idx = F.col("_pr") * 100.0
    lo = F.floor(idx).cast("int")
    hi = F.least(lo + 1, F.lit(100))
    g_lo = F.element_at(F.col("_grid"), lo + 1)
    g_hi = F.element_at(F.col("_grid"), hi + 1)
    return (
        ranked.crossJoin(F.broadcast(grid))
        .withColumn(
            "norm_score", F.round(g_lo + (idx - lo) * (g_hi - g_lo), 6)
        )
        .drop("_pr", "_grid")
    )


def n3_quantile_normalized_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Certification: per-document quantile-normalized model scores (the
    model scores themselves are oracle-certified 6 dp values, so both
    engines rank and interpolate identical inputs)."""
    from hadoop_stuff_spark.operators.scoring import score_quality

    docs = spread(load_table(spark, sf_dir, "documents"))
    # eager checkpoint: the Arrow-batched scoring chain feeds BOTH the
    # rank window and the grid aggregate — without materialization the
    # UDF evaluates at two plan sites (the dup-Arrow-chain defect
    # plans/lint.py exists to catch)
    scored = (
        score_quality(docs)
        .select("doc_id", "source", "model_score")
        .localCheckpoint(eager=True)
    )
    return quantile_normalize(scored, "model_score", "source").select(
        "doc_id", "source", "model_score", "norm_score"
    )


def _quantnorm_sql() -> str:
    from hadoop_stuff_spark.operators.scoring import MODEL_SCORES_SQL

    grid = ", ".join(repr(p) for p in _GRID)
    return f"""
WITH scores AS ({MODEL_SCORES_SQL}),
s AS (
  SELECT sc.doc_id, d.source, sc.model_score
  FROM scores sc JOIN documents d USING (doc_id)
), ranked AS (
  SELECT doc_id, source, model_score,
         percent_rank() OVER (
           PARTITION BY source ORDER BY model_score
         ) AS pr
  FROM s
), grid AS (
  SELECT quantile_cont(model_score, [{grid}]) AS g FROM s
)
SELECT doc_id, source, model_score,
       round(g[CAST(floor(pr * 100.0) AS INT) + 1]
             + (pr * 100.0 - floor(pr * 100.0))
               * (g[least(CAST(floor(pr * 100.0) AS INT) + 1, 100) + 1]
                  - g[CAST(floor(pr * 100.0) AS INT) + 1]), 6) AS norm_score
FROM ranked CROSS JOIN grid
"""


QUANTNORM_SQL = _quantnorm_sql()
