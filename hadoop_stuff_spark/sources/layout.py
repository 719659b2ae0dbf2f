"""Write-side data layout for scan pruning (SURVEY.md P11/P12 evolved).

The reference tuned HDFS block sizes and date/host directories by hand
(IngestTest.java:58,66). Columnar layout adds a second pruning axis the
reference never had: parquet row-group min/max statistics. A range-sorted
(or z-ordered, for multi-column) write makes row groups *disjoint* in the
sort key, so a selective predicate skips whole row groups at scan time —
the reader does this from footer stats without touching data pages.

`write_range_sorted` = `repartitionByRange(key)` (one range-shuffle at
write time; Spark samples split points) + `sortWithinPartitions(key)` so
every file AND every row group inside it covers a tight, non-overlapping
key range. At 100 TB this converts a point/range query on the sort key
from a full scan into touching O(selectivity) row groups — the same
contract as a coarse clustered index.

Certification (tests/test_layout.py): pyarrow reads the footers back and
asserts the sorted layout's row-group [min,max] ranges are disjoint while
the unsorted control's overlap ~completely."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int,
    row_group_mb: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partition + in-file sort on ``sort_col``; small row groups
    (``row_group_mb``) sharpen skipping granularity at the cost of footer
    size — the P5 chunk-size tradeoff, columnar edition."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .option("parquet.block.size", row_group_mb * 1024 * 1024)
        .parquet(path)
    )
