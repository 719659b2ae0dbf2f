"""Test-fixture generators as engine functions (SURVEY.md T8/T9).

The reference seeds its own test data: ghost-record injection during
ingest (probability ~1e-7 per line, position logged —
IngestTest.java:105,114-123) and a fixed CDR record emitted repeatedly
(HdfsReadWriteSample.java:112-113). Here both are deterministic,
seeded column expressions — the needle positions are reproducible from
the seed, so a recall test can assert exactly-k without logging
positions anywhere."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inject_needles(
    df: DataFrame,
    line_col: str,
    needle: str,
    p: float = 1e-7,
    seed: int = 42,
) -> DataFrame:
    """T8 ghost-record injection: with seeded probability ``p`` per row,
    replace the line with the marker record (tagged ``__is_needle`` so
    tests can count ground truth without re-deriving the RNG)."""
    is_needle = F.rand(seed) < p
    return df.withColumn("__is_needle", is_needle).withColumn(
        line_col,
        F.when(is_needle, F.lit(needle)).otherwise(F.col(line_col)),
    )


def synth_flow_records(n_col: Column | str = "id") -> Column:
    """T9-style synthetic flow/syslog line derived from a numeric column
    (unique per row, fixed grammar — the IngestTest.java:105 template)."""
    idx = F.col(n_col) if isinstance(n_col, str) else n_col
    return F.concat(
        F.lit("<24> 2012-06-13T00:25:02 {CGN-SET2}[USER]: ASP_SFW_DELETE_FLOW: proto 7 "
              "(TELNET) application: test"),
        (idx % 10).cast("string"),
        F.lit(", ge-12/0/0.0:156.56.0."),
        (idx % 250).cast("string"),
        F.lit(":19972 -> 156.56.0.125:19973, deleting forward or watch flow "),
        idx.cast("string"),
    )
