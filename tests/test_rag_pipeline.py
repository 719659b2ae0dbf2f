"""RAG ingest pipeline e2e: documents -> chunk -> embed -> ANN index ->
query; every stage is the certified operator, composed."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.chunking import chunk_documents
from hadoop_stuff_spark.operators.embedding import embed_text


def test_embeddings_are_deterministic_and_normalized(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor")],
        "id long, chunk_text string",
    )
    a = {r.id: r.embedding for r in embed_text(df).collect()}
    b = {r.id: r.embedding for r in embed_text(df.repartition(7)).collect()}
    assert a == b  # partitioning-invariant
    import math

    for v in a.values():
        assert abs(math.fsum(x * x for x in v) - 1.0) < 1e-5
        assert len(v) == 64


def test_rag_pipeline_chunk_embed_search(spark, sf_dir, tmp_path):
    """End to end: chunk the corpus, embed chunks, store, then retrieve
    top-k chunks for a query embedding via the brute-force scorer; the
    chunk containing the query text itself must rank first (its stub
    embedding is identical)."""
    docs = load_table(spark, sf_dir, "documents").limit(100)
    chunks = chunk_documents(docs, window=32, overlap=8).withColumn(
        "vec_id",
        F.monotonically_increasing_id(),
    )
    embedded = embed_text(chunks).select("vec_id", "doc_id", "chunk_idx", "chunk_text", "embedding")
    store = str(tmp_path / "chunk_embeddings")
    embedded.write.parquet(store)
    corpus = spark.read.parquet(store)

    # take an existing chunk's text as the query -> exact-match retrieval
    probe = corpus.orderBy("vec_id").limit(1).collect()[0]
    qdf = spark.createDataFrame([(probe.chunk_text,)], "chunk_text string")
    qvec = embed_text(qdf).collect()[0].embedding

    from hadoop_stuff_spark.functions.vectors import cosine

    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    scored = (
        corpus.withColumn("sim", F.round(cosine(qlit, F.col("embedding")), 6))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert scored[0].vec_id == probe.vec_id
    assert scored[0].sim >= 0.999999
    # and the rest are genuinely dissimilar (stub embeddings ~orthogonal)
    assert all(r.sim < 0.9 for r in scored[1:])
