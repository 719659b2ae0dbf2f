"""Python UDTF surface (SURVEY.md §2.5 U-surface, completed).

The reference's UDF surface is map fn / reduce fn / expression predicate
(U1-U3, all covered). Spark 4 adds a fourth kind the reference never
had: table functions — one input row to N output rows with a real
schema, usable in SQL via LATERAL and registered like any function.
Provided here so the engine's UDF story is the full U1-U4 square.

`ExplodeKv` is the 1→N workhorse shape: split a packed string field
(the reference's CDR records are exactly this — semicolon-packed
key=value, RealTimeCdrWiretap.java:68 selectors poke at them with
regex) into typed (key, value) rows.

Scale note: UDTFs are row-at-a-time Python — the SLOW path, kept here
deliberately as the API-surface demo. The hot-path equivalents in this
engine are pure Catalyst (`explode(split(...))`, `from_json`,
`str_to_map`) — see `operators/logs.py`; use those unless you need
imperative per-row logic.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, value: string")
class ExplodeKv:
    """kv-packed string → one row per pair: `SELECT ... FROM t, LATERAL
    explode_kv(payload)`. Pairs are `k=v` separated by `;` (whitespace
    tolerated); malformed fragments yield (fragment, NULL) instead of
    raising — the quarantine-not-crash rule (operators/quality.py)."""

    def eval(self, payload: str):
        if payload is None:
            return
        for frag in payload.split(";"):
            frag = frag.strip()
            if not frag:
                continue
            if "=" in frag:
                k, v = frag.split("=", 1)
                yield k.strip(), v.strip()
            else:
                yield frag, None


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (idempotent)."""
    spark.udtf.register("explode_kv", ExplodeKv)
