"""Property tests for the second round-6-continuation wave: BPE merge-pair
counting, retrieval MRR eval, rolling median despiking. Oracle parity
rides the registry-wide sweep; these pin the semantics on constructed
inputs with hand-computed answers."""

import pytest

from hadoop_stuff_spark.operators.similarity import retrieval_mrr
from hadoop_stuff_spark.operators.temporal import rolling_median_event_values
from hadoop_stuff_spark.operators.textstats import bpe_merge_candidates


def test_bpe_merge_candidates_weights_by_word_frequency(spark):
    """Pair counts multiply per-word pair occurrences by corpus word
    frequency — 'abab'×3 docs contributes ab:6 ba:3 — and single-char
    words contribute nothing."""
    docs = spark.createDataFrame(
        [(0, "abab abab abab cd x")], ["doc_id", "text"]
    )
    out = {r["pair"]: r["n_occurrences"] for r in bpe_merge_candidates(docs).collect()}
    assert out == {"ab": 6, "ba": 3, "cd": 1}


def test_bpe_merge_candidates_top1_is_merge_choice(spark):
    """The top candidate is the pair a BPE trainer would merge first."""
    docs = spark.createDataFrame(
        [(0, "hello hello help hero")], ["doc_id", "text"]
    )
    top = bpe_merge_candidates(docs, k=1).collect()[0]
    assert top["pair"] == "he" and top["n_occurrences"] == 4


def test_retrieval_mrr_known_ranking(spark):
    """Query 0 (label 1): nearest neighbor is the wrong label, the
    same-label vector ranks 2nd → first_rel_rank 2, RR 0.5, one relevant
    hit in the top 10."""
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.141], 0),   # cosine ≈ 0.990 — rank 1, wrong label
        (2, [0.9, 0.436], 1),    # cosine ≈ 0.900 — rank 2, relevant
        (3, [0.0, 1.0], 0),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    (out,) = retrieval_mrr(emb, n_queries=1, k=10).collect()
    assert out["query_id"] == 0 and out["label"] == 1
    assert out["first_rel_rank"] == 2
    assert out["reciprocal_rank"] == pytest.approx(0.5)
    assert out["rel_in_top10"] == 1


def test_retrieval_mrr_no_relevant_yields_null_not_drop(spark):
    """A query whose label has no other member must still appear, with
    NULL rank — silent drops would skew the eval mean."""
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.5, 0.5], 0),
        (2, [0.0, 1.0], 0),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    (out,) = retrieval_mrr(emb, n_queries=1).collect()
    assert out["first_rel_rank"] is None
    assert out["reciprocal_rank"] is None
    assert out["rel_in_top10"] == 0


def test_rolling_median_rejects_spike(spark, sf_dir, tmp_path):
    """Hand-computed 5-row rolling medians over one user's sequence with
    a spike: [1, 100, 2, 3, 4] → [1, 50.5, 2, 2.5, 3]."""
    # ts is int64 NANOS in the testdata parquet layout (load_table
    # rebuilds TimestampType from it), so the fixture writes the same
    base_ns = 1_700_000_000 * 1_000_000_000
    rows = [
        (i, base_ns + i * 60_000_000_000, 7, "t", v, "{}")
        for i, v in enumerate([1.0, 100.0, 2.0, 3.0, 4.0])
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(path)
    # point the loader at a dir whose events.parquet is the fixture
    import shutil, os

    sf = tmp_path / "sf"
    os.makedirs(sf)
    written = [f for f in os.listdir(path) if f.endswith(".parquet")]
    shutil.copy(os.path.join(path, written[0]), sf / "events.parquet")
    out = rolling_median_event_values(spark, str(sf)).orderBy("event_id").collect()
    assert [r["rolling_median5"] for r in out] == [1.0, 50.5, 2.0, 2.5, 3.0]


def test_rolling_median_matches_direct_computation(spark, sf_dir):
    """On real data: the operator's median equals a driver-side
    recomputation for a sampled user."""
    out = rolling_median_event_values(spark, sf_dir)
    one_user = out.orderBy("user_id").first()["user_id"]
    rows = (
        out.filter(out.user_id == one_user).orderBy("event_id").collect()
    )
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(f"user_id = {one_user}")
        .orderBy("ts", "event_id")
        .collect()
    )
    vals = [r["value"] for r in ev]
    by_event = {r["event_id"]: r["rolling_median5"] for r in rows}
    for i, r in enumerate(ev):
        frame = sorted(vals[max(0, i - 4) : i + 1])
        n = len(frame)
        med = (frame[(n + 1) // 2 - 1] + frame[n // 2]) / 2.0
        assert by_event[r["event_id"]] == pytest.approx(round(med, 6), abs=1e-9)
