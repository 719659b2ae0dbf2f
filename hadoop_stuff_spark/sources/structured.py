"""Structured text sources: JSONL and CSV with explicit schemas and
corrupt-record quarantine — the "messy landing zone" readers a
large-scale pipeline needs next to the reference's raw-line and chunked
stores (reference scans are line-oriented only: TailF.java:21-184,
ChunkRecorder.java:30-61).

Design: read as TEXT and parse with `from_json` / `from_csv` instead of
the raw-file JSON/CSV datasource. Same single scan and the parser still
runs JVM-side, but the raw line is always in hand, so quarantining never
hits Spark's corrupt-column-only-projection restriction, needs no
cache(), and the identical expressions compose onto readStream text
sources unchanged.

Scale rules encoded here:
- ALWAYS pass an explicit schema: schema inference is a full extra pass
  over the data (at 100 TB, a second 100 TB scan before the first real
  job). `infer_jsonl_schema` exists for interactive use but samples a
  bounded number of files.
- PERMISSIVE parsing with a `_corrupt` capture column: bad records land
  in a quarantine frame instead of killing the job or being silently
  dropped (same contract as explode_chunks(permissive=True) for the
  chunked store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt"

_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}


def _with_corrupt(schema: StructType | str) -> StructType:
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return schema.add(CORRUPT_COL, "string", True)


def _unpack(lines: DataFrame, parsed) -> DataFrame:
    # keep the raw line under the quarantine column name: if the parser
    # flagged the row, expose the whole original line (not the parser's
    # possibly-partial echo), else null
    out = lines.select(F.col("value").alias("_raw"), parsed.alias("_p"))
    return out.select(
        "_p.*",
        F.when(F.col(f"_p.{CORRUPT_COL}").isNotNull(), F.col("_raw"))
        .alias("_keep_corrupt"),
    ).withColumn(CORRUPT_COL, F.col("_keep_corrupt")).drop("_keep_corrupt")


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSON-lines reader: explicit schema (no inference pass), PERMISSIVE
    parsing, malformed lines captured whole in `_corrupt`."""
    lines = spark.read.text(path)
    parsed = F.from_json(F.col("value"), _with_corrupt(schema), _PARSE_OPTS)
    return _unpack(lines, parsed)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV reader with the same explicit-schema + quarantine contract.
    With header=True, lines exactly matching the schema's header are
    dropped (one per input file)."""
    lines = spark.read.text(path)
    full = _with_corrupt(schema)
    if header:
        names = [f.name for f in full.fields if f.name != CORRUPT_COL]
        lines = lines.filter(F.col("value") != sep.join(names))
    parsed = F.from_csv(
        F.col("value"), full.simpleString(), dict(_PARSE_OPTS, sep=sep)
    )
    return _unpack(lines, parsed)


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a permissively-parsed frame into (clean, corrupt): clean rows
    lose the quarantine column; corrupt rows keep only the raw line."""
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt


def infer_jsonl_schema(
    spark: SparkSession, path: str, sample_files: int = 1
) -> StructType:
    """Interactive helper: infer a schema from a bounded sample (NOT the
    whole dataset — inference is an extra scan; never default to it)."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        all_files = sorted(
            f
            for f in _glob.glob(_os.path.join(path, "*"))
            if not _os.path.basename(f).startswith(("_", "."))
        )
    else:
        all_files = [path]
    # a sampled part file can be record-empty (tiny datasets, many
    # partitions): widen the sample until some records were seen
    n = max(1, sample_files)
    while True:
        schema = spark.read.json(all_files[:n]).schema
        if schema.fields or n >= len(all_files):
            return schema
        n *= 2


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """JSON-lines sink (gzip by default — fine for archival/interchange;
    use parquet for columnar analytics outputs)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
