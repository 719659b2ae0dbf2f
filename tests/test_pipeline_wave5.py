"""Property tests for the fifth round-6-continuation wave: Gini length
concentration, cross-source near-dup overlap matrix, sampled cosine-pair
histogram. Oracle parity rides the registry-wide sweep; these pin
semantics on constructed inputs with hand-computed answers."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_stuff_spark.operators.dedup import source_overlap_matrix
from hadoop_stuff_spark.operators.profile import gini_doc_length_by_source
from hadoop_stuff_spark.operators.similarity import cosine_pair_histogram

# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow


def _docs_fixture(tmp_path, rows):
    """rows: list of (doc_id, text, source)."""
    sf = tmp_path / "sf"
    os.makedirs(sf)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(sf / "documents.parquet"))
    return str(sf)


def test_gini_uniform_is_zero_concentrated_is_high(spark, tmp_path):
    """Four equal-length docs -> Gini 0; lengths [1,1,1,97] -> Gini
    computed by the rank identity: (2*(1*1+2*1+3*1+4*97) - 5*100) /
    (4*100) = (788 - 500)/400 = 0.72; the top-decile cut (ranks > 3.6
    -> rank 4) holds 0.97 of the characters."""
    eq = [(i, "x" * 10, "flat") for i in range(4)]
    skew = [
        (10, "a", "skewed"),
        (11, "b", "skewed"),
        (12, "c", "skewed"),
        (13, "z" * 97, "skewed"),
    ]
    sf = _docs_fixture(tmp_path, eq + skew)
    out = {r["source"]: r for r in gini_doc_length_by_source(spark, sf).collect()}
    assert out["flat"]["gini"] == pytest.approx(0.0)
    assert out["skewed"]["gini"] == pytest.approx(0.72)
    assert out["skewed"]["total_chars"] == 100
    assert out["skewed"]["top_decile_share"] == pytest.approx(0.97)
    # uniform: top decile (rank 4 of 4) holds exactly its 1/4 share
    assert out["flat"]["top_decile_share"] == pytest.approx(0.25)


def test_source_overlap_matrix_cells(spark, tmp_path):
    """Two near-identical docs across sources A/B plus an unrelated C
    doc: exactly one (A,B) cell; the triangular ordering puts the
    lexically smaller source first regardless of doc id order."""
    shared = " ".join(f"w{i}" for i in range(30))
    rows = [
        (0, shared, "srcB"),               # note: B has the LOWER id
        (1, shared + " tail extra", "srcA"),
        (2, " ".join(f"u{i}" for i in range(30)), "srcC"),
    ]
    sf = _docs_fixture(tmp_path, rows)
    out = source_overlap_matrix(spark, sf).collect()
    assert len(out) == 1
    (cell,) = out
    assert (cell["source_a"], cell["source_b"]) == ("srcA", "srcB")
    assert cell["n_pairs"] == 1
    assert 0.4 <= cell["avg_jaccard"] <= 1.0


def test_cosine_pair_histogram_bins_and_mass(spark):
    """Orthogonal/parallel/antiparallel vectors land in bins 10, 19, 0;
    total mass = C(n_sampled, 2). fraction=1.0 keeps all vectors."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 0),   # orthogonal to 0 -> sim 0 -> bin 10
            (2, [2.0, 0.0], 0),   # parallel to 0   -> sim 1 -> bin 19
            (3, [-1.0, 0.0], 0),  # antiparallel    -> sim -1 -> bin 0
        ],
        ["vec_id", "embedding", "label"],
    )
    rows = {r["bin"]: r for r in cosine_pair_histogram(emb, fraction=1.0).collect()}
    assert sum(r["n_pairs"] for r in rows.values()) == 6
    assert rows[19]["n_pairs"] == 1          # (0,2) -- sim 1 clamps into bin 19
    assert rows[0]["n_pairs"] == 2           # (0,3), (2,3) -- sim -1 in bin 0
    assert rows[10]["n_pairs"] == 3          # (0,1), (1,2), (1,3) -- sim 0
    assert rows[19]["bin_lo"] == pytest.approx(0.9)
    assert rows[0]["bin_lo"] == pytest.approx(-1.0)


def test_cosine_pair_histogram_sample_is_deterministic(spark):
    """The md5 keep-predicate picks the same vectors on every run and
    partitioning: two invocations agree exactly."""
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)], 0) for i in range(60)],
        ["vec_id", "embedding", "label"],
    )
    a = sorted(map(tuple, cosine_pair_histogram(emb).collect()))
    b = sorted(map(tuple, cosine_pair_histogram(emb.repartition(7)).collect()))
    assert a == b


def test_gini_all_empty_source_yields_null_not_crash(spark, tmp_path):
    """Second-review regression: a source whose documents are all empty
    (total_chars = 0) must yield NULL gini/share like the oracle, not an
    ANSI DIVIDE_BY_ZERO that kills the whole profile."""
    sf = _docs_fixture(
        tmp_path,
        [(0, "", "emptysrc"), (1, "", "emptysrc"), (2, "x" * 10, "ok")],
    )
    out = {r["source"]: r for r in gini_doc_length_by_source(spark, sf).collect()}
    assert out["emptysrc"]["gini"] is None
    assert out["emptysrc"]["top_decile_share"] is None
    assert out["emptysrc"]["total_chars"] == 0
    assert out["ok"]["gini"] == pytest.approx(0.0)


def test_cosine_histogram_zero_vector_excluded_not_crash(spark):
    """Second-review regression: a zero vector has no direction — under
    ANSI the norm division crashed Spark while DuckDB silently binned a
    fake -1.0. Zero-norm vectors are excluded on both engines."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0), (2, [0.0, 0.0], 0)],
        ["vec_id", "embedding", "label"],
    )
    rows = cosine_pair_histogram(emb, fraction=1.0).collect()
    assert sum(r["n_pairs"] for r in rows) == 1  # only the (0,1) pair
