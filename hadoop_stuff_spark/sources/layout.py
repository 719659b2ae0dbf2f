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


def _interleave(quant, bits):
    """Bit-plane interleave of pre-bucketed (0..2^bits-1) long columns."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for q in quant:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(q, bit).bitwiseAND(F.lit(1).cast("long"))
            )
    return z


def zorder_key(cols: list[str], bits: int = 16):
    """Z-order (Morton) key over 2+ numeric columns, pure Catalyst.

    Each column is rank-normalized to ``bits`` bits via percent_rank (so
    skewed distributions still spread evenly), then the bit planes are
    interleaved with shift/OR folds — no UDF, whole-stage-codegen
    eligible. Sorting by the result clusters rows so that row-group
    min/max stats are selective on EVERY participating column at once
    (a range sort is selective only on its leading column)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n = len(cols)
    assert n >= 2, "zorder needs >= 2 columns"
    quant = [
        F.least(
            F.lit((1 << bits) - 1),
            (F.percent_rank().over(Window.orderBy(c)) * ((1 << bits) - 1)).cast("long"),
        )
        for c in cols
    ]
    return _interleave(quant, bits)


def zorder_key_bounded(df: DataFrame, cols: list[str], bits: int = 8):
    """The 100 TB Z-order variant `write_zordered`'s docstring promises:
    bucket bounds come from `approxQuantile` on a SAMPLE (one cheap pass,
    driver holds 2^bits-1 cutpoints per column) instead of a global
    percent_rank window — no single-ordered-window bottleneck at any
    scale. Bucket index = count of cutpoints <= value, evaluated against
    a literal array JVM-side. Returns the Column; bounds are embedded as
    literals so the key is deterministic for a fixed input."""
    from pyspark.sql import functions as F

    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    quant_cols = []
    for c in cols:
        cuts = df.stat.approxQuantile(c, probs, 0.001)
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        q = F.size(
            F.filter(arr, lambda cut: cut <= F.col(c).cast("double"))
        ).cast("long")
        quant_cols.append(F.least(q, F.lit(n_cuts).cast("long")))
    return _interleave(quant_cols, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    row_group_mb: int = 8,
    mode: str = "overwrite",
    bounded: bool = False,
) -> None:
    """Multi-column pruning layout: range-partition + in-file sort on the
    Morton key of ``cols``, so predicates on ANY of the columns skip row
    groups from footer stats (test proves both dimensions prune vs a
    single-column sort where only the leading column does).

    Caveat (same as every Z-order implementation): percent_rank needs a
    global rank — here one window over the write set. The window variant
    is exact and fine at normal write-batch sizes (a day's partition,
    not the lifetime table); pass ``bounded=True`` for the 100 TB path
    (`zorder_key_bounded`: approxQuantile cutpoint buckets, no global
    window, same interleave)."""
    key = (
        zorder_key_bounded(df, cols, min(bits, 8)) if bounded else zorder_key(cols, bits)
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .option("parquet.block.size", row_group_mb * 1024 * 1024)
        .parquet(path)
    )
