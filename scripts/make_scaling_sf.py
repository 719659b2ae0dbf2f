#!/usr/bin/env python3
"""Build a fourth scaling decade (VERDICT r6 #6) by fact replication.

The driver provides sf0.001/0.01/0.1 (TESTDATA.md, read-only). Three
points fit a slope; four expose a bend — so this script synthesizes a
LARGER scale factor locally under ``<repo>/.scaling/sf<X>`` (gitignored)
by replicating the sf0.1 tables ``factor`` times with key remapping, so
per-key densities (orders per customer, lineitems per order, events per
user, shingles per doc) stay EXACTLY at sf0.1 levels while total volume
grows linearly — the honest shape for a scaling measurement, unlike
naive row duplication which would turn every dedup query quadratic.

Remapping rules per replica i (0 = verbatim sf0.1):
- join keys get ``+ i * (max_key + 1)`` offsets consistently on both
  sides (customer/orders, orders/lineitem, part+supplier/lineitem), so
  replicas never join across each other;
- ``documents.text`` gets a pure-letter suffix ``q<letter>z`` appended
  to every token for i > 0 — it survives clean_text (letters only), so
  replicas share no shingles and near-dup density stays at sf0.1 levels
  instead of every doc acquiring factor-1 exact copies;
- ``embeddings.embedding`` is rotated by i positions (norm-preserving,
  decorrelates replicas) for the same reason in cosine space.

Determinism: pure SQL over the frozen sf0.1 parquet — no RNG, no time.

Usage: python scripts/make_scaling_sf.py [--factor 5] [--force]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(factor: int = 5, force: bool = False) -> str:
    # factor > 26 would run the per-replica suffix past 'z' into
    # non-letter chars (which clean_text strips, re-colliding replica
    # shingles), and factor >= the 64-dim embedding width would make
    # the rotation wrap to identity (exact duplicate vectors) — both
    # silently break the replica-independence invariant this script
    # exists to guarantee.
    if not 1 <= factor <= 26:
        raise ValueError(f"factor must be in [1, 26], got {factor}")
    label = round(0.1 * factor, 4)
    out_dir = os.path.join(REPO, ".scaling", f"sf{label}")
    if os.path.isdir(out_dir):
        if not force:
            print(f"exists: {out_dir} (use --force to rebuild)")
            return out_dir
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )

    def stride(table: str, key: str) -> int:
        return con.execute(f"SELECT max({key}) + 1 FROM {table}").fetchone()[0]

    ck = stride("customer", "c_custkey")
    ok = stride("orders", "o_orderkey")
    pk = stride("part", "p_partkey")
    sk = stride("supplier", "s_suppkey")
    ek = stride("events", "event_id")
    uk = stride("events", "user_id")
    dk = stride("documents", "doc_id")
    vk = stride("embeddings", "vec_id")

    def emit(name: str, replica_sql) -> None:
        union = " UNION ALL ".join(replica_sql(i) for i in range(factor))
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    # dimensions that no replicated fact re-keys: verbatim copies
    for t in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    emit("customer", lambda i: f"""
        SELECT c_custkey + {i * ck} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM customer""")
    emit("supplier", lambda i: f"""
        SELECT s_suppkey + {i * sk} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM supplier""")
    emit("part", lambda i: f"""
        SELECT p_partkey + {i * pk} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice FROM part""")
    emit("orders", lambda i: f"""
        SELECT o_orderkey + {i * ok} AS o_orderkey,
               o_custkey + {i * ck} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders""")
    emit("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * ok} AS l_orderkey,
               l_partkey + {i * pk} AS l_partkey,
               l_suppkey + {i * sk} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem""")
    emit("events", lambda i: f"""
        SELECT event_id + {i * ek} AS event_id, ts,
               user_id + {i * uk} AS user_id,
               event_type, value, props
        FROM events""")

    def doc_sql(i: int) -> str:
        if i == 0:
            return "SELECT doc_id, text, lang, source, n_chars FROM documents"
        suffix = f"q{chr(97 + i)}z"  # pure letters: survives clean_text
        return f"""
        SELECT doc_id + {i * dk} AS doc_id,
               rtrim(replace(text || ' ', ' ', '{suffix} ')) AS text,
               lang, source,
               length(rtrim(replace(text || ' ', ' ', '{suffix} ')))
                 AS n_chars
        FROM documents"""

    emit("documents", doc_sql)

    def emb_sql(i: int) -> str:
        if i == 0:
            return "SELECT vec_id, embedding, label FROM embeddings"
        return f"""
        SELECT vec_id + {i * vk} AS vec_id,
               embedding[{i + 1}:] || embedding[1:{i}] AS embedding,
               label
        FROM embeddings"""

    emit("embeddings", emb_sql)
    print(f"done: {out_dir}")
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    build(args.factor, args.force)
