"""Keyed partition-scoped upsert: replaced keys, inserted keys, untouched
sibling partitions, bounded rewrite scope, idempotency."""

import glob
import hashlib
import os

import pyspark.sql.functions as F

from hadoop_stuff_spark.sources.upsert import upsert_by_key
import pytest

# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow


def _table_state(spark, path):
    return {
        (r.k): (r.day, r.v)
        for r in spark.read.parquet(path).select("k", "day", "v").collect()
    }


def _partition_digest(path, day):
    files = sorted(glob.glob(os.path.join(path, f"day={day}", "*.parquet")))
    h = hashlib.sha256()
    for f in files:
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_upsert_replaces_inserts_and_leaves_siblings_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(k, k % 4, f"old_{k}") for k in range(40)], "k long, day int, v string"
    )
    base.write.partitionBy("day").parquet(path)
    untouched_before = {d: _partition_digest(path, d) for d in (1, 3)}

    delta = spark.createDataFrame(
        [(0, 0, "new_0"), (8, 0, "new_8"), (100, 0, "ins_100"), (200, 5, "ins_200")],
        "k long, day int, v string",
    )
    stats = upsert_by_key(spark, path, delta, keys=["k"], partition_cols=["day"])
    assert stats == {
        "partitions_touched": 2,
        "rows_replaced": 2,
        "rows_inserted": 2,
    }

    state = _table_state(spark, path)
    assert len(state) == 42  # 40 original - 0 lost + 2 inserted
    assert state[0] == (0, "new_0")
    assert state[8] == (0, "new_8")
    assert state[100] == (0, "ins_100")
    assert state[200] == (5, "ins_200")
    assert state[1] == (1, "old_1")  # sibling partition rows intact
    # sibling partition DIRECTORIES byte-identical (never rewritten)
    assert {d: _partition_digest(path, d) for d in (1, 3)} == untouched_before


def test_upsert_is_idempotent_for_same_delta(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.createDataFrame(
        [(k, k % 3, k * 10) for k in range(30)], "k long, day int, v long"
    ).write.partitionBy("day").parquet(path)
    delta = spark.createDataFrame(
        [(3, 0, -1), (300, 0, -2)], "k long, day int, v long"
    )
    upsert_by_key(spark, path, delta, ["k"], ["day"])
    first = _table_state(spark, path)
    stats = upsert_by_key(spark, path, delta, ["k"], ["day"])
    assert _table_state(spark, path) == first
    assert stats["rows_replaced"] == 2  # the delta's own prior landing
    assert stats["rows_inserted"] == 0


def test_upsert_rejects_duplicate_delta_keys(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t3")
    spark.createDataFrame(
        [(1, 0, 1)], "k long, day int, v long"
    ).write.partitionBy("day").parquet(path)
    dup_delta = spark.createDataFrame(
        [(1, 0, 10), (1, 0, 20)], "k long, day int, v long"
    )
    with pytest.raises(ValueError, match="duplicate key"):
        upsert_by_key(spark, path, dup_delta, ["k"], ["day"])


def test_upsert_rejects_null_delta_keys(spark, tmp_path):
    """NULL merge keys are undefined for MERGE: a NULL-key delta row never
    matches the replace anti-join (nor the strict mover check), so it
    would silently duplicate on every merge (ADVICE r5 low). Refused
    upfront, before any bytes are written."""
    import pytest

    path = str(tmp_path / "t_null")
    spark.createDataFrame(
        [(1, 0, 1)], "k long, day int, v long"
    ).write.partitionBy("day").parquet(path)
    null_delta = spark.createDataFrame(
        [(2, 0, 10), (None, 0, 20)], "k long, day int, v long"
    )
    before = _partition_digest(path, 0)
    with pytest.raises(ValueError, match="NULL in key columns"):
        upsert_by_key(spark, path, null_delta, ["k"], ["day"])
    with pytest.raises(ValueError, match="NULL in key columns"):
        upsert_by_key(spark, path, null_delta, ["k"], ["day"], strict=True)
    assert _partition_digest(path, 0) == before  # nothing was written


def test_upsert_sequence_matches_dict_model(spark, tmp_path):
    """Model-based: a sequence of random upserts applied to the parquet
    table must equal the same sequence applied to a plain dict —
    replacement, insertion and partition scoping all composed."""
    import random

    path = str(tmp_path / "seq")
    rng = random.Random(42)
    model: dict[int, tuple[int, int]] = {}

    rows = [(k, rng.randrange(4), rng.randrange(1000)) for k in range(50)]
    for k, day, v in rows:
        model[k] = (day, v)
    spark.createDataFrame(rows, "k long, day int, v long").write.partitionBy(
        "day"
    ).parquet(path)

    for step in range(5):
        n = rng.randrange(1, 8)
        delta_rows = []
        seen = set()
        for _ in range(n):
            k = rng.randrange(80)  # mixes existing + new keys
            if k in seen:
                continue
            seen.add(k)
            # keep a key's partition stable on update (day is part of the
            # row identity for partition-scoped upsert)
            day = model[k][0] if k in model else rng.randrange(6)
            delta_rows.append((k, day, 10_000 * step + k))
        delta = spark.createDataFrame(delta_rows, "k long, day int, v long")
        upsert_by_key(spark, path, delta, ["k"], ["day"])
        for k, day, v in delta_rows:
            model[k] = (day, v)

        got = {
            r.k: (r.day, r.v)
            for r in spark.read.parquet(path).select("k", "day", "v").collect()
        }
        assert got == model, f"diverged at step {step}"


def test_strict_upsert_rejects_partition_movers(spark, tmp_path):
    """strict=True scans key+partition columns of the whole table and
    refuses a delta that moves a key to a different partition value —
    the case where partition-scoped rewrite would strand the old row as
    a duplicate key (ADVICE r4 low)."""
    import pytest

    path = str(tmp_path / "t_strict")
    spark.createDataFrame(
        [(k, k % 4, f"old_{k}") for k in range(40)], "k long, day int, v string"
    ).write.partitionBy("day").parquet(path)

    mover = spark.createDataFrame(
        [(0, 2, "moved_0")], "k long, day int, v string"  # k=0 lives in day=0
    )
    with pytest.raises(ValueError, match="strict upsert refused"):
        upsert_by_key(
            spark, path, mover, keys=["k"], partition_cols=["day"], strict=True
        )
    # table unchanged — refusal happens before any write
    assert _table_state(spark, path)[0] == (0, "old_0")

    # a stable-key correction passes the strict check and applies
    ok = spark.createDataFrame([(0, 0, "new_0")], "k long, day int, v string")
    stats = upsert_by_key(
        spark, path, ok, keys=["k"], partition_cols=["day"], strict=True
    )
    assert stats["rows_replaced"] == 1
    assert _table_state(spark, path)[0] == (0, "new_0")
