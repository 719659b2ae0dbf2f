"""Spark 4 Python DataSource implementations (pluggable source surface).

Two sources the stock file source cannot express, built on the public
`pyspark.sql.datasource` API so they register like any format
(`spark.read.format("greplog")` / `spark.readStream.format("tailf")`):

- ``tailf`` (streaming): true in-place tail. Structured Streaming's file
  source reads a file ONCE when it first appears — bytes appended later
  are silently missed. The reference's tailer (TailF.java:110-149) keeps
  a per-file byte pointer precisely to pick up appends. Here that
  pointer IS the streaming offset: `latestOffset` reports each file's
  last complete-line boundary, Spark checkpoints it, and `partitions`
  turns each (start, end) byte slice into one task. Restart-safe where
  the reference's pointer died with the JVM, and offset capping at the
  last newline means a half-written line is never emitted.

- ``greplog`` (batch): a text scan with SOURCE-SIDE filter pushdown.
  `pushFilters` accepts `StringContains`/`EqualTo` on ``value`` and
  applies them while scanning, so non-matching lines are dropped before
  they ever become rows (the reference's grep-at-the-scan,
  DistributedGrep.java:51-60, as a pluggable format). Unsupported
  filters are handed back to Spark and still applied — semantics never
  change, pushdown is purely an optimization.

Scale shape: both plan one InputPartition per file (per file-slice for
tailf) — the standard split model; driver work per trigger is one
os.stat + one small tail read per file, executor work is a sequential
byte-range read. At 1000 executors the directory listing is the only
driver cost, same as Spark's own file source.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    InputPartition,
    StringContains,
)

_TAIL_SCAN = 1 << 20  # how far back to look for the last newline


def _last_complete_offset(path: str, lo: int = 0) -> int:
    """Byte offset just past the last complete line (the largest safe
    read boundary); never below ``lo`` (a previously committed offset)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return lo
    if size <= lo:
        return lo
    with open(path, "rb") as f:
        back = min(size, _TAIL_SCAN)
        f.seek(size - back)
        chunk = f.read(back)
    nl = chunk.rfind(b"\n")
    if nl < 0:
        return lo
    boundary = size - back + nl + 1
    return max(boundary, lo)


@dataclass
class _FileSlice(InputPartition):
    path: str
    start: int
    end: int


def _read_slice(path: str, start: int, end: int) -> Iterator[str]:
    if end <= start:
        return
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
    for line in data.decode("utf-8", errors="replace").splitlines():
        yield line


class _TailFStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("tailf requires a 'path' option (directory to tail)")
        self._pattern = options.get("pattern", "*")

    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self._dir, self._pattern)))

    def initialOffset(self) -> dict:
        start_at_end = False  # reference tails from the beginning (TailF.java:117)
        return {p: _last_complete_offset(p) for p in self._files()} if start_at_end else {}

    def latestOffset(self) -> dict:
        # monotonic per file: never report less than what exists now
        return {p: _last_complete_offset(p) for p in self._files()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts = []
        for path, hi in end.items():
            lo = int(start.get(path, 0))
            if int(hi) > lo:
                parts.append(_FileSlice(path, lo, int(hi)))
        # a trigger with no new bytes still needs >= 1 (empty) partition
        return parts or [_FileSlice("", 0, 0)]

    def read(self, partition: _FileSlice) -> Iterator[tuple]:
        if not partition.path:
            return
        for line in _read_slice(partition.path, partition.start, partition.end):
            yield (line, partition.path)

    def commit(self, end: dict) -> None:
        pass


class TailFDataSource(DataSource):
    """``spark.readStream.format("tailf").option("path", dir)`` — register
    with ``spark.dataSource.register(TailFDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "tailf"

    def schema(self) -> str:
        return "value string, source_file string"

    def streamReader(self, schema):
        return _TailFStreamReader(self.options)


class _GrepLogReader(DataSourceReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("greplog requires a 'path' option")
        self._pattern = options.get("pattern", "*")
        self._contains: list[str] = []
        self._equals: list[str] = []
        self._file_contains: list[str] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, StringContains) and f.attribute == ("value",):
                self._contains.append(f.value)
            elif isinstance(f, EqualTo) and f.attribute == ("value",):
                self._equals.append(f.value)
            elif isinstance(f, StringContains) and f.attribute == ("source_file",):
                # planning-time FILE pruning: a non-matching file is never
                # opened (the Python-source analog of partition pruning)
                self._file_contains.append(f.value)
            else:
                yield f  # not ours — Spark applies it after the scan

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(glob.glob(os.path.join(self._dir, self._pattern)))
        files = [
            p for p in files if all(c in p for c in self._file_contains)
        ]
        return [_FileSlice(p, 0, os.path.getsize(p)) for p in files]

    def read(self, partition: _FileSlice) -> Iterator[tuple]:
        contains, equals = self._contains, self._equals
        for line in _read_slice(partition.path, partition.start, partition.end):
            if any(c not in line for c in contains):
                continue
            if any(line != e for e in equals):
                continue
            yield (line, partition.path)


class GrepLogDataSource(DataSource):
    """``spark.read.format("greplog").option("path", dir)`` with
    source-side substring pushdown on the ``value`` column."""

    @classmethod
    def name(cls) -> str:
        return "greplog"

    def schema(self) -> str:
        return "value string, source_file string"

    def reader(self, schema):
        return _GrepLogReader(self.options)


def register(spark) -> None:
    """Register both formats on a session (idempotent)."""
    spark.dataSource.register(TailFDataSource)
    spark.dataSource.register(GrepLogDataSource)
