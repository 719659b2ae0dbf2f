"""Model-based quality scoring (operators/scoring.py): score bounds,
filter semantics, partitioning invariance of the Arrow-batched inference."""

from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.scoring import (
    filter_by_quality,
    score_quality,
)


def test_scores_bounded_and_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = {r["doc_id"]: r["model_score"] for r in
         score_quality(docs).select("doc_id", "model_score").collect()}
    assert a and all(0.0 < s < 1.0 for s in a.values())
    # Arrow batch boundaries must not affect scores
    b = {r["doc_id"]: r["model_score"] for r in
         score_quality(docs.repartition(13)).select("doc_id", "model_score").collect()}
    assert a == b


def test_filter_by_quality_threshold(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = score_quality(docs)
    med = scored.approxQuantile("model_score", [0.5], 0.01)[0]
    kept = filter_by_quality(docs, med)
    n_kept, n_all = kept.count(), docs.count()
    assert 0 < n_kept < n_all
    assert kept.columns == docs.columns
    # every kept doc re-scores at or above the threshold
    assert (
        score_quality(kept).filter(F.col("model_score") < med).count() == 0
    )
