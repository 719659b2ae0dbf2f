"""Engine facade: the reference's entry-point lifecycle (ingest → count →
grep → sql) end-to-end on a temp store, plus CLI arg parsing."""

import os

from hadoop_stuff_spark.engine import Engine
from hadoop_stuff_spark.__main__ import build_parser


def test_ingest_count_grep_roundtrip(spark, tmp_path):
    src = tmp_path / "source.txt"
    lines = [f"record {i} payload x{i % 7}" for i in range(1000)]
    lines[123] = "record 123 GHOST needle"  # T8-style planted needle
    src.write_text("\n".join(lines) + "\n")
    store = str(tmp_path / "store")

    eng = Engine(spark)
    eng.ingest(str(src), store, chunk_size=200)

    # count comes from chunk metadata (no decompress) and must be exact
    assert eng.record_count(store).collect()[0]["record_count"] == 1000

    hits = eng.grep(store, "GHOST").collect()
    assert len(hits) == 1 and "needle" in hits[0]["value"]

    assert eng.grep_count(store, r"x3$").collect()[0][0] == len(
        [l for l in lines if l.endswith("x3")]
    )


def test_sql_surface(spark, sf_dir):
    eng = Engine(spark)
    n = eng.sql("SELECT count(*) AS n FROM region", sf_dir=sf_dir).collect()[0]["n"]
    assert n == 5


def test_cli_parser_grammar():
    p = build_parser()
    a = p.parse_args(["grep", "/store", "GHOST", "--format", "text", "--count"])
    assert (a.cmd, a.path, a.pattern, a.format, a.count) == (
        "grep", "/store", "GHOST", "text", True
    )
    a = p.parse_args(["wiretap", "/logs", ".*x.* h1:99", "--available-now"])
    assert a.subscription == [".*x.* h1:99"] and a.available_now
    a = p.parse_args(["ingest", "src.txt", "dst", "--chunk-size", "200"])
    assert a.chunk_size == 200


def test_engine_round3_facade(spark, sf_dir, tmp_path):
    """chunk -> embed -> lint + quality gate through the facade."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.engine import Engine

    eng = Engine(spark)
    docs = load_table(spark, sf_dir, "documents").limit(20)
    chunks = eng.chunk(docs, window=16, overlap=4)
    embedded = eng.embed(chunks)
    assert "embedding" in embedded.columns and embedded.count() >= 20
    assert eng.lint(chunks) == []

    clean, quarantine = eng.enforce_quality(
        docs, {"has_text": F.length("text") > 0}
    )
    assert clean.count() + quarantine.count() == 20

    rep = eng.check_quality(docs, {"has_text": F.length("text") > 0}).collect()
    assert rep[0].rule == "has_text" and rep[0].n_rows == 20
