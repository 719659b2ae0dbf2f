"""Round-11 wave operators: planted-fixture certification beyond the
registry-wide oracle parity sweep (which runs on the real testdata, where
the 1M default budget clips EVERY source uniformly — these fixtures force
the unclipped, clipped and zero-canonical-mass paths to diverge)."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from hadoop_stuff_spark.operators.dedup import (
    DEDUP_TOKEN_BUDGET_SQL,
    n3_dedup_aware_token_budget,
)


def _docs_fixture(tmp_path, docs, name="sf_w11"):
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[2] for d in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array([d[1] for d in docs]),
            "n_chars": pa.array([len(d[2]) for d in docs], pa.int64()),
        }
    )
    sf = tmp_path / name
    os.makedirs(sf, exist_ok=True)
    pq.write_table(table, str(sf / "documents.parquet"))
    return str(sf)


LONG = " ".join(f"w{i}" for i in range(100))  # 100 tokens
ALLOC_FIXTURE = [
    (1, "srcA", LONG),          # canonical: srcA owns the long doc
    (2, "srcB", LONG),          # copy — canonical_id=1, srcB loses the mass
    (3, "srcB", "a b c d"),     # srcB's only canonical tokens (4)
    (4, "srcC", LONG),          # srcC is ALL copies: canonical_tokens = 0
]


def test_dedup_token_budget_clip_and_zero_canonical(spark, tmp_path):
    """budget=120, tau=2: dedup shares are exactly sqrt(100):sqrt(4):0 =
    10:2:0 over canonical tokens, so srcA draws a full unclipped epoch,
    srcB clips at max_epochs, and srcC (pure copier) is guarded to zero
    epochs/draw instead of a 0/0 NULL-vs-NaN divergence. The correction
    vs the raw-count allocator moves budget from the copiers to srcA."""
    sf = _docs_fixture(tmp_path, ALLOC_FIXTURE)
    rows = {
        r["source"]: r
        for r in n3_dedup_aware_token_budget(
            spark, sf, budget_tokens=120, tau=2.0, max_epochs=4.0
        ).collect()
    }
    a, b, c = rows["srcA"], rows["srcB"], rows["srcC"]
    assert (a["canonical_tokens"], b["canonical_tokens"], c["canonical_tokens"]) == (
        100,
        4,
        0,
    )
    # shares 10/12 and 2/12 of 120 → 100 and 20 tokens
    assert a["allocated_tokens"] == 100 and not a["clipped"]
    assert a["epochs"] == 1.0 and a["tokens_drawn"] == 100
    assert b["allocated_tokens"] == 20 and b["clipped"]
    assert b["epochs"] == 4.0 and b["tokens_drawn"] == 16  # floor(4*4)
    # the zero-canonical guard: explicit zeros, never NULL/NaN
    assert c["target_share"] == 0.0 and c["allocated_tokens"] == 0
    assert c["epochs"] == 0.0 and not c["clipped"] and c["tokens_drawn"] == 0
    # raw allocator would fund the copiers; dedup returns that budget to A
    assert a["budget_correction"] > 0
    assert b["budget_correction"] < 0 and c["budget_correction"] < 0
    assert (
        a["budget_correction"] + b["budget_correction"] + c["budget_correction"]
        <= 0 + 2  # floors may drop up to ~1 token per source
    )
    # realized shares renormalize over what was actually drawn (116)
    assert abs(sum(r["realized_share"] for r in rows.values()) - 1.0) < 1e-5
    assert a["realized_share"] == round(100 / 116, 6)


def test_dedup_token_budget_matches_duckdb_on_planted(spark, tmp_path):
    """Cross-engine pin of the guard/clip branches the real testdata never
    exercises (there every source clips identically): the certified SQL on
    the planted fixture must reproduce the engine row-for-row at the
    DEFAULT constants."""
    sf = _docs_fixture(tmp_path, ALLOC_FIXTURE, name="sf_w11_x")
    got = {
        r["source"]: r for r in n3_dedup_aware_token_budget(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    oracle = con.execute(DEDUP_TOKEN_BUDGET_SQL).fetch_arrow_table().to_pylist()
    con.close()
    assert len(oracle) == len(got) == 3
    for row in oracle:
        mine = got[row["source"]]
        for col, val in row.items():
            assert mine[col] == val, (row["source"], col, mine[col], val)
