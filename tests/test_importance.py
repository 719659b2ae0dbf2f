"""DSIR importance-resampling property tests (oracle parity is covered by
tests/test_oracle_parity.py; these pin the selection behavior)."""

from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.importance import n3_importance_resampling


def test_importance_scores_separate_target_language(spark, sf_dir):
    # Score the whole corpus (k = corpus size): target-language documents
    # must score higher ON AVERAGE than the rest — the property that makes
    # DSIR selection work at all. Measured at sf0.001: -0.685 (en) vs
    # -0.855 (non-en).
    n = load_table(spark, sf_dir, "documents").count()
    scored = n3_importance_resampling(spark, sf_dir, k=n)
    means = {
        r.is_en: r.m
        for r in scored.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("score").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_importance_topk_enriches_target_language(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base_rate = (
        docs.filter(F.col("lang") == "en").count() / docs.count()
    )
    top = n3_importance_resampling(spark, sf_dir, k=25).collect()
    top_rate = sum(1 for r in top if r.lang == "en") / len(top)
    assert top_rate > base_rate


def test_importance_deterministic_across_partitionings(spark, sf_dir):
    # fixed-point score sums must be partition-invariant
    a = n3_importance_resampling(spark, sf_dir).collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = n3_importance_resampling(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
