"""Partition retention — expire old partitions of a date-partitioned
table, the third leg of table maintenance (with `compact.py` and
`backfill.py`).

Deleting data at 100 TB must be a METADATA operation: dropping whole
partition directories (an O(partitions) filesystem op) — never a
filtered rewrite of the table (an O(bytes) job that doubles storage
while it runs). `expire_partitions` lists the table's partition
directories, parses the partition value from the path (Hive layout,
``col=value``), and removes directories older than the cutoff. Rows
inside a retained partition are never touched, so the operation is
idempotent and safe to re-run.

A dry-run mode returns what WOULD be dropped — retention jobs are the
classic "deleted a year of data with a bad cutoff" incident, so the
default is look-don't-touch.

Reference provenance: the reference accumulated date/host directories
forever (IngestTest.java:58,68 — append-only, no cleanup story); this is
the missing lifecycle half of that layout.
"""

from __future__ import annotations

import glob
import os
import shutil
from urllib.parse import unquote


def list_partitions(table_path: str, col: str) -> list[tuple[str, str]]:
    """(value, directory) for each Hive-layout partition of ``col``."""
    out = []
    for d in sorted(glob.glob(os.path.join(table_path, f"{col}=*"))):
        if os.path.isdir(d):
            out.append((unquote(os.path.basename(d).split("=", 1)[1]), d))
    return out


def expire_partitions(
    table_path: str,
    col: str,
    keep_from: str,
    dry_run: bool = True,
) -> list[str]:
    """Drop partitions with ``value < keep_from`` (string compare — the
    Hive convention works because date partition values are ISO-formatted
    and zero-padded). Returns the dropped (or would-drop) values.
    ``dry_run=True`` (the default) only reports."""
    dropped = []
    for value, d in list_partitions(table_path, col):
        if value < keep_from:
            dropped.append(value)
            if not dry_run:
                shutil.rmtree(d)
    return dropped
