"""Property tests for the fourth round-6-continuation wave: asymmetric
containment dedup, skip-gram co-occurrence, k-anonymity audit. Oracle
parity rides the registry-wide sweep; these pin semantics on constructed
inputs — in particular the quote-inside-long-doc case Jaccard misses."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_stuff_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from hadoop_stuff_spark.operators.quality import k_anonymity_report
from hadoop_stuff_spark.operators.textstats import skipgram_cooccurrence


def _docs_fixture(tmp_path, texts):
    sf = tmp_path / "sf"
    os.makedirs(sf)
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(sf / "documents.parquet"))
    return str(sf)


def test_containment_catches_quote_inside_long_doc(spark, tmp_path):
    """Doc 0 is a 10-token paragraph quoted verbatim inside doc 1's 150
    tokens: containment_a = 1.0 (every shingle of the short doc appears
    in the long one) while Jaccard is far below its 0.4 threshold — the
    pair is invisible to ngram_jaccard_pairs and MUST surface here."""
    quote = " ".join(f"q{i}" for i in range(10))
    filler = " ".join(f"w{i}" for i in range(140))
    sf = _docs_fixture(tmp_path, [quote, filler + " " + quote])
    got = ngram_containment_pairs(spark, sf).collect()
    assert len(got) == 1
    (r,) = got
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["containment_a"] == pytest.approx(1.0)
    assert r["containment"] == pytest.approx(1.0)
    # the short doc has 8 shingles, the long one 148, all 8 shared
    assert r["n_common"] == 8
    assert r["containment_b"] == pytest.approx(round(8 / 148, 6))
    # and Jaccard at its default threshold misses the pair entirely
    assert ngram_jaccard_pairs(spark, sf).collect() == []


def test_containment_unrelated_docs_not_reported(spark, tmp_path):
    sf = _docs_fixture(
        tmp_path,
        [" ".join(f"a{i}" for i in range(20)), " ".join(f"b{i}" for i in range(20))],
    )
    assert ngram_containment_pairs(spark, sf).collect() == []


def test_skipgram_pairs_hand_computed(spark):
    """'a b c d' at window 2: ordered pairs (a,b) (a,c) (b,c) (b,d)
    (c,d), once each; a repeated bigram doubles its pair count; a
    single-token doc contributes nothing."""
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b a b"), (2, "x")], ["doc_id", "text"]
    )
    out = {
        (r["w"], r["c"]): r["n_pairs"]
        for r in skipgram_cooccurrence(docs).collect()
    }
    # doc 1 pairs: (a,b) (a,a) (b,a) (b,b) (a,b) -> (a,b)x2 + 3 singles
    assert out[("a", "b")] == 1 + 2
    assert out[("a", "c")] == 1
    assert out[("b", "c")] == 1
    assert out[("b", "d")] == 1
    assert out[("c", "d")] == 1
    assert out[("a", "a")] == 1 and out[("b", "a")] == 1 and out[("b", "b")] == 1
    assert not any(w == "x" or c == "x" for (w, c) in out)
    assert sum(out.values()) == 5 + 5


def test_skipgram_window_bound_respected(spark):
    """window=1 reduces to adjacent bigrams only."""
    docs = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    out = {
        (r["w"], r["c"])
        for r in skipgram_cooccurrence(docs, window=1).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


def test_k_anonymity_class_size_distribution(spark):
    """Quasi (city, age): two unique rows (k=1), one class of 3 -> the
    report reads k=1:2 classes/2 rows, k=3:1 class/3 rows."""
    df = spark.createDataFrame(
        [
            ("nyc", 30, "u1"),
            ("nyc", 31, "u2"),
            ("sf", 40, "u3"),
            ("sf", 40, "u4"),
            ("sf", 40, "u5"),
        ],
        ["city", "age", "uid"],
    )
    rows = {r["k"]: r for r in k_anonymity_report(df, ["city", "age"]).collect()}
    assert rows[1]["n_classes"] == 2 and rows[1]["n_rows"] == 2
    assert rows[3]["n_classes"] == 1 and rows[3]["n_rows"] == 3
    assert set(rows) == {1, 3}


def test_k_anonymity_nulls_form_their_own_class(spark):
    """NULL quasi-values group together (conservative: NULL patterns can
    re-identify too), not silently dropped."""
    df = spark.createDataFrame(
        [(None, 1, "a"), (None, 1, "b"), ("x", 1, "c")],
        ["city", "age", "uid"],
    )
    rows = {r["k"]: r for r in k_anonymity_report(df, ["city", "age"]).collect()}
    assert rows[2]["n_classes"] == 1  # the two NULL-city rows
    assert rows[1]["n_classes"] == 1
