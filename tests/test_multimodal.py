"""Multimodal plumbing tests (N4): binary columns through mapInPandas."""

from hadoop_stuff_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    synthesize_blobs,
)


def test_blob_synthesis_schema(spark, sf_dir):
    blobs = synthesize_blobs(spark, sf_dir)
    assert blobs.schema.simpleString() == (
        "struct<doc_id:bigint,payload:binary,media_type:string,n_bytes:bigint>"
    )


def test_feature_extraction_shapes(spark, sf_dir):
    blobs = synthesize_blobs(spark, sf_dir)
    feats = extract_media_features(blobs)
    rows = feats.collect()
    assert len(rows) == blobs.count()
    for r in rows[:20]:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-6  # histogram normalized
        assert r.width is not None and r.height is not None


def test_feature_extraction_deterministic(spark, sf_dir):
    blobs = synthesize_blobs(spark, sf_dir)
    a = {r.doc_id: tuple(r.feature) for r in extract_media_features(blobs).collect()}
    b = {r.doc_id: tuple(r.feature) for r in extract_media_features(blobs).collect()}
    assert a == b
