"""Document chunking: oracle parity, window/overlap semantics, and
losslessness of the non-overlapped stride."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.operators.chunking import (
    CHUNKS_SQL,
    chunk_documents,
    n3_document_chunks,
)


def test_chunks_match_oracle(spark, sf_dir):
    from tests.oracle_harness import compare_query

    ok, msg = compare_query(spark, sf_dir, n3_document_chunks, CHUNKS_SQL)
    assert ok, msg


def test_window_overlap_semantics(spark):
    df = spark.createDataFrame([(1, "a b c d e f g"), (2, "x")], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, window=3, overlap=1).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    got = [(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in rows]
    assert got == [
        (1, 0, "a b c", 3),
        (1, 1, "c d e", 3),
        (1, 2, "e f g", 3),
        (1, 3, "g", 1),
        (2, 0, "x", 1),
    ]


def test_zero_overlap_is_lossless(spark, sf_dir):
    """With overlap=0, chunk tokens reassemble to exactly the document's
    tokens (no loss, no duplication) — checked in aggregate."""
    from hadoop_stuff_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    chunks = chunk_documents(docs, window=50, overlap=0)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("chunk_toks"),
        F.concat_ws(" ", F.collect_list("chunk_text")).alias("rejoined"),
    )
    orig = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("orig_toks"),
        F.col("text"),
    )
    j = per_doc.join(orig, "doc_id")
    # token counts equal AND (since collect_list has no order guarantee we
    # check content equality only when order survives: sort by chunk_idx)
    assert j.filter(F.col("chunk_toks") != F.col("orig_toks")).count() == 0
    ordered = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                    lambda s: s.chunk_text,
                ),
                " ",
            ).alias("rejoined")
        )
        .join(orig, "doc_id")
    )
    # spot-check a few docs end-to-end
    for r in ordered.limit(5).collect():
        assert r.rejoined == r.text


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, window=4, overlap=4)


def test_chunk_count_formula_property(spark):
    """Property (hypothesis): for any token count n >= 1 and valid
    (window, overlap), the number of chunks is ceil(n / stride), every
    chunk has 1..window tokens, and the union of chunk tokens covers the
    document (sum of n_tokens >= n, == n when overlap == 0)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    cases = []

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=300),
        window=st.integers(min_value=2, max_value=50),
        overlap=st.integers(min_value=0, max_value=49),
    )
    def gen(n, window, overlap):
        if overlap < window:
            cases.append((n, window, overlap))

    gen()
    # one Spark job for all sampled cases (row per case, distinct params
    # exercised via separate chunk_documents calls grouped by param pair)
    by_params = {}
    for i, (n, w, o) in enumerate(cases):
        by_params.setdefault((w, o), []).append((i, n))
    for (w, o), docs in by_params.items():
        df = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n))) for i, n in docs],
            "doc_id long, text string",
        )
        rows = chunk_documents(df, window=w, overlap=o).collect()
        stride = w - o
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r.doc_id, []).append(r)
        for i, n in docs:
            chunks = per_doc[i]
            assert len(chunks) == math.ceil(n / stride), (n, w, o)
            assert all(1 <= r.n_tokens <= w for r in chunks)
            total = sum(r.n_tokens for r in chunks)
            assert total >= n
            if o == 0:
                assert total == n
