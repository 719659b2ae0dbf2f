"""Engine facade: the reference's entry-point lifecycle (ingest → count →
grep → sql) end-to-end on a temp store, plus CLI arg parsing."""

import os

from hadoop_stuff_spark.engine import Engine
from hadoop_stuff_spark.__main__ import build_parser
import pytest

# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow


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


def test_facade_round4_sketch_and_upsert_paths(spark, sf_dir, tmp_path):
    """Smoke the round-4 facade surface end to end: theta overlap +
    retention, KLL quantiles, CMS estimates, partition-scoped upsert."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.engine import Engine

    eng = Engine(spark)
    events = load_table(spark, sf_dir, "events")

    th = eng.theta_sketches(events)
    row = eng.audience_overlap(th, "purchase", "click").collect()[0]
    assert row.n_both <= row.n_either
    d0, d1 = [
        str(r.d)
        for r in events.select(F.to_date("ts").alias("d")).distinct().orderBy("d").limit(2).collect()
    ]
    ret = eng.retention(th, d0, d1).collect()[0]
    assert ret.n_retained + ret.n_churned == ret.n_day_a

    q = eng.quantiles(eng.quantile_sketches(events)).collect()
    assert all(r.p50 <= r.p95 <= r.p99 for r in q)

    cms = eng.frequency_sketches(events)
    some_user = events.select("user_id").first().user_id
    est = eng.frequency_estimates(cms, [some_user])
    true = events.filter(F.col("user_id") == some_user).count()
    assert est[some_user] >= true

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, 0, "a"), (2, 1, "b")], "k long, day int, v string") \
        .write.partitionBy("day").parquet(path)
    stats = eng.upsert(
        path,
        spark.createDataFrame([(1, 0, "A"), (3, 0, "c")], "k long, day int, v string"),
        ["k"], ["day"],
    )
    assert stats["rows_replaced"] == 1 and stats["rows_inserted"] == 1


def test_facade_frequency_scoring_and_corpus_overlap(spark, sf_dir):
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.engine import Engine

    eng = Engine(spark)
    events = load_table(spark, sf_dir, "events")
    cms = eng.frequency_sketches(events)
    probes = events.select("user_id").distinct().limit(20)
    scored = eng.score_by_frequency(cms, probes, "user_id")
    rows = scored.collect()
    assert all(r.est_count >= 1 for r in rows)  # every probed user occurred

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rep = eng.corpus_overlap(
        docs.filter(F.col("doc_id") < 250), docs.filter(F.col("doc_id") >= 200)
    ).collect()[0]
    assert rep.n_shared >= 0 and rep.jaccard <= 1.0


def test_facade_curate_pipeline(spark, sf_dir):
    """One-call curation: monotone funnel, zero residual contamination,
    a split column partitioning the survivors, deterministic re-run."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.engine import Engine
    from hadoop_stuff_spark.operators.contamination import overlap_report

    eng = Engine(spark)
    docs = load_table(spark, sf_dir, "documents")
    holdout = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)

    out = eng.curate(corpus, holdout)
    n_out = out.count()
    assert 0 < n_out <= corpus.count()
    assert set(out.columns) == set(corpus.columns) | {"split"}
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits

    # every survivor sits at or under the contamination threshold; the
    # strict any-overlap posture (max_contamination=0.0) still works
    worst = (
        overlap_report(out.drop("split"), holdout)
        .agg(F.max("contam_frac").alias("m"))
        .collect()[0]["m"]
    )
    assert worst <= 0.05
    strict = eng.curate(corpus, holdout, max_contamination=0.0)
    resid = (
        overlap_report(strict.drop("split"), holdout)
        .agg(F.coalesce(F.sum("n_contaminated"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    assert resid == 0

    again = eng.curate(corpus, holdout)
    a = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in again.select("doc_id", "split").collect()}
    assert a == b  # deterministic end to end


def test_curate_stage_attribution_via_qlog(spark, sf_dir, tmp_path):
    """VERDICT r5 #6: with a QueryLog, the curate composite decomposes
    into timed per-stage rows whose union is the whole pipeline, and the
    staged run's output is identical to the fused lazy run."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.engine import Engine
    from hadoop_stuff_spark.plans.qlog import QueryLog

    eng = Engine(spark)
    docs = load_table(spark, sf_dir, "documents")
    holdout = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)

    import time

    eng.curate(corpus, holdout).count()  # warm the UDF/JIT paths
    qlog = QueryLog(spark, str(tmp_path / "qlog"))
    t0 = time.perf_counter()
    staged = eng.curate(corpus, holdout, qlog=qlog)
    composite_wall = time.perf_counter() - t0
    fused = eng.curate(corpus, holdout)
    a = {(r.doc_id, r.split) for r in staged.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in fused.select("doc_id", "split").collect()}
    assert a == b  # attribution barriers change scheduling, not results

    rows = {r.name: r for r in qlog.table().collect()}
    assert set(rows) == {
        "curate:clean_exact_dedup",
        "curate:near_dedup",
        "curate:contamination",
        "curate:repetition_gate",
        "curate:split",
    }
    assert all(r.wall_s > 0 for r in rows.values())
    # the stage walls must actually account for the composite (each
    # covers build + materialize; only ms-scale log writes sit outside)
    attributed = sum(r.wall_s for r in rows.values())
    assert attributed >= 0.4 * composite_wall, (attributed, composite_wall)


def test_curate_prescreen_fast_path_and_byte_identical_output(spark, tmp_path):
    """VERDICT r5 #7: prescreen on DISJOINT corpora takes the fast path
    (no contamination stage executes) and on OVERLAPPING corpora the
    output is identical with and without the prescreen."""
    from hadoop_stuff_spark.engine import Engine
    from hadoop_stuff_spark.plans.qlog import QueryLog

    eng = Engine(spark)
    corpus = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo{i} foxtrot golf") for i in range(40)],
        "doc_id long, text string",
    )
    disjoint_holdout = spark.createDataFrame(
        [(1000, "hotel india juliet kilo lima mike")], "doc_id long, text string"
    )
    overlapping_holdout = spark.createDataFrame(
        [(1000, "alpha bravo charlie delta november")], "doc_id long, text string"
    )

    def splits(df):
        return {(r.doc_id, r.split) for r in df.select("doc_id", "split").collect()}

    # disjoint: gate fires — the qlog proves no contamination stage ran
    qlog = QueryLog(spark, str(tmp_path / "qlog_fast"))
    fast = eng.curate(corpus, disjoint_holdout, prescreen=True, qlog=qlog)
    names = {r.name for r in qlog.table().collect()}
    assert "curate:contamination" not in names
    assert splits(fast) == splits(eng.curate(corpus, disjoint_holdout))

    # overlapping: gate must NOT fire; output byte-identical either way
    with_pre = eng.curate(corpus, overlapping_holdout, prescreen=True)
    without = eng.curate(corpus, overlapping_holdout)
    assert splits(with_pre) == splits(without)
    # and the overlap really did drop the contaminated docs (every doc
    # shares "alpha bravo charlie"+"bravo charlie delta" with holdout,
    # but at the default fractional threshold only high-overlap docs go)
    assert with_pre.count() == without.count()


def test_curate_prescreen_zero_scan_blob_path(spark, tmp_path):
    """The maintained-sketch gate variant: a blob built per corpus slice
    with sketch_corpus_for_prescreen and folded with merge_theta_blobs
    drives the fast path with no contamination stage — and the same
    blob against an overlapping holdout correctly refuses the skip."""
    from hadoop_stuff_spark.engine import Engine
    from hadoop_stuff_spark.operators.sketches import merge_theta_blobs
    from hadoop_stuff_spark.plans.qlog import QueryLog

    eng = Engine(spark)
    slice_a = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo{i} foxtrot golf") for i in range(20)],
        "doc_id long, text string",
    )
    slice_b = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo{i} foxtrot golf") for i in range(20, 40)],
        "doc_id long, text string",
    )
    corpus = slice_a.unionByName(slice_b)
    blob = merge_theta_blobs(
        spark,
        [
            eng.sketch_corpus_for_prescreen(slice_a),
            eng.sketch_corpus_for_prescreen(slice_b),
        ],
    )
    disjoint_holdout = spark.createDataFrame(
        [(1000, "hotel india juliet kilo lima mike")], "doc_id long, text string"
    )
    overlapping_holdout = spark.createDataFrame(
        [(1000, "alpha bravo charlie delta november")], "doc_id long, text string"
    )

    def splits(df):
        return {(r.doc_id, r.split) for r in df.select("doc_id", "split").collect()}

    qlog = QueryLog(spark, str(tmp_path / "qlog_blob"))
    fast = eng.curate(
        corpus,
        disjoint_holdout,
        prescreen=True,
        prescreen_corpus_blob=blob,
        qlog=qlog,
    )
    assert "curate:contamination" not in {r.name for r in qlog.table().collect()}
    assert splits(fast) == splits(eng.curate(corpus, disjoint_holdout))

    with_blob = eng.curate(
        corpus, overlapping_holdout, prescreen=True, prescreen_corpus_blob=blob
    )
    assert splits(with_blob) == splits(eng.curate(corpus, overlapping_holdout))


def test_registry_curate_entry_keeps_a_healthy_funnel(spark):
    """Regression pin for the round-4 defect where the any-overlap
    contamination rule emptied the corpus: the benchable registry entry
    must yield all three splits with a substantial surviving corpus."""
    from hadoop_stuff_spark.plans.registry import QUERIES

    rows = {
        r["split"]: r.n_docs
        for r in QUERIES["n1_curate_pipeline"].fn(spark, "/root/testdata/sf0.01").collect()
    }
    assert set(rows) == {"train", "val", "test"}
    assert sum(rows.values()) > 400  # of 475 corpus docs
    assert rows["train"] > rows["val"]
