"""Local mirror of the driver's DuckDB-oracle differential check:
row-count + column names + order-insensitive value comparison, run at
sf0.001 so mismatches surface before the driver's sf0.01 gate."""

from __future__ import annotations

import math

import duckdb

from hadoop_stuff_spark.catalog import TABLES


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and format stably
        return f"{v + 0.0:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def compare_query(spark, sf_dir: str, fn, sql: str):
    """Returns (ok, message)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(sf_dir, sql)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    _, sn = normalize(s_cols, s_rows)
    _, on = normalize(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
