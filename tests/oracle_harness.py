"""Local mirror of the driver's DuckDB-oracle differential check:
row-count + column names + order-insensitive value comparison, run at
sf0.001 so mismatches surface before the driver's sf0.01 gate.

Arrow-faithful since round 8 (VERDICT r7 #1): the round-7 driver reds came
from DuckDB typing `sum(BIGINT)` as HUGEINT — which the DuckDB Python API's
`fetchall()` launders into plain `int`, so nine local driver-sims could not
see what the driver (hashing at the Arrow boundary) saw.  The harness now
fetches the oracle result as an Arrow table and compares a canonical TYPE
FAMILY per column alongside the rendered values: int64 vs decimal128 (the
Arrow carrier for HUGEINT) is a mismatch here exactly as it is at the
driver, while width-only differences (int32 vs int64, float vs double)
stay compatible.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa

from hadoop_stuff_spark.catalog import TABLES


def run_oracle(sf_dir: str, sql: str) -> pa.Table:
    """Run `sql` against the sf_dir parquet views and return the result as
    an Arrow table — NOT fetchall(), which converts HUGEINT → int and hides
    the type boundary the driver hashes at."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    tbl = con.execute(sql).fetch_arrow_table()
    con.close()
    return tbl


_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def describe_oracle(sf_dir: str, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb type) pairs for `sql`'s output — planning only."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    con.close()
    return [(r[0], r[1]) for r in rows]


def banned_oracle_columns(sf_dir: str, sql: str) -> list[tuple[str, str]]:
    """Output columns whose DuckDB type would trip the driver's Arrow-level
    hash (HUGEINT/UHUGEINT/DECIMAL where Spark emits int64/double)."""
    return [
        (c, t)
        for c, t in describe_oracle(sf_dir, sql)
        if any(b in t.upper() for b in _BANNED_ORACLE_TYPES)
    ]


def arrow_type_family(t: pa.DataType) -> str:
    """Canonical signature of an Arrow type at the driver's hash boundary.

    Families — not exact types — because the engines legitimately differ in
    width (Spark int vs DuckDB BIGINT) and unit (us vs ns timestamps), and
    the r7 driver rows prove those pass; what reds is a FAMILY difference:
    decimal128 (DuckDB HUGEINT/DECIMAL carrier) vs int64, string vs binary.
    """
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_family(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{arrow_type_family(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _spark_arrow(sdf) -> pa.Table:
    # PySpark 4 DataFrame.toArrow(); keep a collect() fallback for safety.
    if hasattr(sdf, "toArrow"):
        return sdf.toArrow()
    return pa.Table.from_pandas(sdf.toPandas())


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and format stably
        return f"{v + 0.0:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        # Spark's toArrow() exports TIMESTAMP tz-aware (session tz, UTC
        # here) while DuckDB's TIMESTAMP is naive — the same instant must
        # render identically, so canonicalize to naive UTC.
        if getattr(v, "tzinfo", None) is not None:
            from datetime import timezone

            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in v.items()) + "}"
    return repr(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def _table_cols_rows(tbl: pa.Table):
    cols = tbl.column_names
    pylists = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*pylists)) if pylists else []
    if tbl.num_columns == 0:
        rows = []
    return cols, rows


def compare_query(spark, sf_dir: str, fn, sql: str):
    """Returns (ok, message).  Compares, in driver order: column names,
    row count, Arrow type FAMILIES per column, normalized values."""
    s_tbl = _spark_arrow(fn(spark, sf_dir))
    o_tbl = run_oracle(sf_dir, sql)
    s_cols, s_rows = _table_cols_rows(s_tbl)
    o_cols, o_rows = _table_cols_rows(o_tbl)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    s_fam = {c: arrow_type_family(s_tbl.schema.field(c).type) for c in s_cols}
    o_fam = {c: arrow_type_family(o_tbl.schema.field(c).type) for c in o_cols}
    bad = {c: (s_fam[c], o_fam[c]) for c in s_fam if s_fam[c] != o_fam[c]}
    if bad:
        return False, f"arrow type-family mismatch (spark, oracle): {bad}"
    _, sn = normalize(s_cols, s_rows)
    _, on = normalize(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
