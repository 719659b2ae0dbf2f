"""Vector column functions over array<float>/array<double> embeddings
(SURVEY.md §2.7 N2) — pure Catalyst higher-order functions (zip_with /
aggregate), JVM-side, no Python in the hot path.

All math is done in double: float32 inputs are cast up front so results are
bit-comparable with the DuckDB oracle (which also computes in double after
an explicit ::DOUBLE[] cast).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right fold — same accumulation order as a scalar
    loop, so double results match other engines' loops bitwise."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(col: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(as_double(col), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
