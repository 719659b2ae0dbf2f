"""File-level min/max index — an external skipping index for parquet
tables, maintained as a tiny table of per-file column ranges.

Parquet already skips ROW GROUPS inside a file the reader opens; what it
cannot skip is opening the file at all (footer read per file — at 100 TB
that is millions of S3 GETs per query). This module materializes the
footer stats ONCE into an index table (one row per file × column:
min/max), and `read_pruned` turns a range predicate into a file LIST
before the scan starts: the driver reads |files-matched| paths from the
index (KBs), and the real scan opens only those.

Scale shape: index build is a mapInPandas over the FILE LIST (each
executor task reads only footers — no data pages), so build cost is
O(files), not O(bytes). The index itself is orders of magnitude smaller
than the data (two doubles per file-column) and is just parquet — query
it, join it, rebuild it per partition. Combined with the write layouts
(`layout.write_range_sorted` / `write_zordered`) file ranges are tight,
so selective predicates prune most files; on an unclustered table the
index degrades to no-skip, never to wrong results (the predicate is
ALWAYS re-applied in the scan).

Reference provenance: the reference's only pruning was directory naming
by date/host (IngestTest.java:58,68) — partition pruning's ancestor.
This is the finer-grained, column-general version of the same idea.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _norm_stat(v) -> tuple[str, float | None, str | None]:
    """Normalize a parquet footer statistic (or a query bound) into the
    index's two comparison domains: ("num", float, None) for numeric /
    temporal values, ("str", None, str) for strings. Both sides of a
    probe normalize through THIS function, so comparisons are consistent
    by construction (dates → ordinal days, timestamps → epoch seconds)."""
    import datetime

    if isinstance(v, bool):
        return "num", float(v), None
    if isinstance(v, (int, float)):
        return "num", float(v), None
    if isinstance(v, datetime.datetime):
        return "num", v.timestamp(), None
    if isinstance(v, datetime.date):
        return "num", float(v.toordinal()), None
    if isinstance(v, bytes):
        return "str", None, v.decode("utf-8", "replace")
    return "str", None, str(v)


_INDEX_SCHEMA = (
    "file string, col string, kind string, "
    "min_num double, max_num double, min_str string, max_str string"
)


def build_file_index(
    spark: SparkSession, table_path: str, cols: list[str], index_path: str
) -> None:
    """One row per (file, column): min/max from the parquet footer, in a
    TYPED layout — numeric/temporal columns index into the `*_num`
    domain (dates as ordinals, timestamps as epoch seconds), string
    columns into `*_str` — so date-range and string-range predicates
    prune too, not just doubles. Footer reads are distributed — the
    driver ships only file PATHS."""
    files = sorted(glob.glob(os.path.join(table_path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {table_path}")
    paths_df = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(len(files), spark.sparkContext.defaultParallelism)
    )
    want = list(cols)

    def footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                names = md.schema.names
                for c in want:
                    idx = names.index(c)
                    lo, hi = None, None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None:
                            continue
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    kind, lo_n, lo_s = _norm_stat(lo)
                    _, hi_n, hi_s = _norm_stat(hi)
                    rows.append((f, c, kind, lo_n, hi_n, lo_s, hi_s))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "col", "kind",
                    "min_num", "max_num", "min_str", "max_str",
                ],
            )

    (
        paths_df.mapInPandas(footers, _INDEX_SCHEMA)
        .write.mode("overwrite")
        .parquet(index_path)
    )


def prune_files(
    spark: SparkSession, index_path: str, col: str, lo, hi
) -> list[str]:
    """Files whose [min,max] for ``col`` intersects [lo,hi] — the tiny
    driver-side result that replaces a full directory listing + open.
    ``lo``/``hi`` may be numbers, strings, dates or datetimes; they are
    normalized exactly as the footer stats were at build time."""
    kind, lo_n, lo_s = _norm_stat(lo)
    _, hi_n, hi_s = _norm_stat(hi)
    if kind == "num":
        pred = (F.col("max_num") >= lo_n) & (F.col("min_num") <= hi_n)
    else:
        pred = (F.col("max_str") >= lo_s) & (F.col("min_str") <= hi_s)
    idx = spark.read.parquet(index_path)
    rows = (
        idx.filter((F.col("col") == col) & (F.col("kind") == kind) & pred)
        .select("file")
        .collect()
    )
    return sorted(r.file for r in rows)


def read_pruned(
    spark: SparkSession,
    index_path: str,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range-filtered read that opens ONLY index-matched files. The
    predicate is re-applied on the scan (the index is an optimization,
    never a correctness dependency); zero matched files yields an empty
    frame with the right semantics via an always-false read of nothing.
    """
    files = prune_files(spark, index_path, col, lo, hi)
    if not files:
        # A legitimately-empty range query must return an empty frame
        # with the base table's schema, not crash. Any indexed file
        # carries the schema; an always-false filter folds to an empty
        # LocalTableScan, so no data pages are read.
        any_file = (
            spark.read.parquet(index_path).select("file").limit(1).collect()
        )
        if not any_file:
            raise ValueError(f"index at {index_path} is empty — rebuild it")
        return spark.read.parquet(any_file[0].file).filter(F.lit(False))
    return spark.read.parquet(*files).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
