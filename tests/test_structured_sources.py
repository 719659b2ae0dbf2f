"""JSONL/CSV structured sources: explicit-schema reads, corrupt-record
quarantine, jsonl round-trip."""

import os

from hadoop_stuff_spark.sources.structured import (
    infer_jsonl_schema,
    quarantine,
    read_csv,
    read_jsonl,
    write_jsonl,
)

JSONL = [
    '{"id": 1, "msg": "ok", "score": 0.5}',
    '{"id": 2, "msg": "fine", "score": 1.25}',
    'this is not json at all',
    '{"id": 4, "msg": }',
]


def test_read_jsonl_quarantines_bad_lines(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(JSONL) + "\n")
    df = read_jsonl(spark, p, "id bigint, msg string, score double")
    clean, corrupt = quarantine(df)
    assert sorted(r["id"] for r in clean.collect()) == [1, 2]
    bad = sorted(r["raw"] for r in corrupt.collect())
    assert bad == sorted([JSONL[2], JSONL[3]])
    assert "_corrupt" not in clean.columns


def test_read_csv_quarantines_bad_rows(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("id,qty\n1,10\n2,notanumber\n3,30\n")
    clean, corrupt = quarantine(read_csv(spark, p, "id bigint, qty bigint"))
    assert sorted((r["id"], r["qty"]) for r in clean.collect()) == [(1, 10), (3, 30)]
    assert [r["raw"] for r in corrupt.collect()] == ["2,notanumber"]


def test_jsonl_roundtrip_and_bounded_inference(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id: long, msg: string"
    )
    write_jsonl(df, out)
    # gzip parts on disk
    parts = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert parts
    schema = infer_jsonl_schema(spark, out)
    back = read_jsonl(spark, out, schema)
    clean, corrupt = quarantine(back)
    assert corrupt.count() == 0
    assert sorted((r["id"], r["msg"]) for r in clean.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
