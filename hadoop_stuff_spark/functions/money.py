"""Exact fixed-point money aggregation.

Summing 2-dp floats then rounding is order-dependent at .005 boundaries:
different partitionings (Spark vs DuckDB, or two Spark runs with different
parallelism) can round a group total to different cents. The fix (applied
engine-wide, PLAN_r2.md "Hardening note"): scale 2-dp inputs to integer
cents — exact longs < 2^53 — sum those (order-independent), and divide
back. Every oracle uses the mirrored SQL form so both engines compute the
identical exact sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sum_2dp_exact(col: str | Column, ndigits: int = 2) -> Column:
    """Order-independent SUM of a 2-dp column: exact integer-cent sum,
    scaled back and rounded to ``ndigits``."""
    c = F.col(col) if isinstance(col, str) else col
    cents = F.round(c * 100, 0).cast("long")
    return F.round(F.sum(cents) / 100.0, ndigits)


def sum_2dp_exact_sql(expr: str, alias: str, ndigits: int = 2) -> str:
    """DuckDB mirror of :func:`sum_2dp_exact` for oracle SQL strings."""
    return (
        f"round(sum(CAST(round(({expr}) * 100, 0) AS BIGINT)) / 100.0, {ndigits})"
        f" AS {alias}"
    )
