"""Query log — per-execution observability the engine can keep for
itself (the reference printed elapsed-ms to stdout and lost it;
IngestTest.java:90-94 / TailFTest javadoc steps — here the same numbers
land in a queryable parquet table).

`QueryLog.run(name, df)` executes a DataFrame (collect by default),
records one row — name, wall seconds, rows returned, exchange count and
lint findings from the physical plan, timestamp — and appends it to the
log table. The log is itself just parquet: query it with the engine,
join it against `BENCH_r*.json`, trend it across days. Lint findings are
stored as `rule:evidence` strings so plan regressions (a new exchange, a
cartesian creeping in) show up in the LOG DIFF, not in a pager.

Driver cost: one local timestamp + one plan render per run — nothing
touches the executors beyond the query itself; the append is one tiny
file per run (compact with sources/compact.py when it accumulates).
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from hadoop_stuff_spark.plans.lint import lint_plan


class QueryLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def run(
        self,
        name: str,
        df: DataFrame,
        action=None,
        extra_wall_s: float = 0.0,
        **lint_kwargs,
    ):
        """Execute ``df`` (``action`` defaults to collect), log one row,
        return the action's result. ``extra_wall_s`` is added to the
        recorded wall — for callers attributing work that already ran
        while CONSTRUCTING ``df`` (e.g. an iterative operator that
        executes convergence jobs at build time)."""
        action = action or (lambda d: d.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        findings = lint_plan(df, **lint_kwargs)
        t0 = time.time()
        result = action(df)
        wall = time.time() - t0 + extra_wall_s
        n_rows = len(result) if hasattr(result, "__len__") else -1
        row = {
            "name": name,
            "wall_s": float(round(wall, 4)),
            "n_rows": int(n_rows),
            "n_exchanges": int(plan.count("Exchange ")),
            "lint": [f"{r}:{e}" for r, e in findings],
            "at": datetime.now(timezone.utc).isoformat(),
        }
        # Local paths append via a driver-side pyarrow write of one tiny
        # file — NOT a Spark job: a one-row createDataFrame().write
        # round-trip measured ~5 s per call (job setup + commit
        # protocol), which dwarfed the stages it was supposed to
        # attribute. Spark reads the directory the same either way.
        # URI-schemed paths (hdfs://, s3a://, ...) keep the Spark writer
        # — os.makedirs/pyarrow can't address them from the driver.
        if "://" in self.path:
            (
                self.spark.createDataFrame(
                    [tuple(row.values())],
                    "name string, wall_s double, n_rows long, n_exchanges long, "
                    "lint array<string>, at string",
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(self.path)
            )
            return result
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                ("name", pa.string()),
                ("wall_s", pa.float64()),
                ("n_rows", pa.int64()),
                ("n_exchanges", pa.int64()),
                ("lint", pa.list_(pa.string())),
                ("at", pa.string()),
            ]
        )
        table = pa.Table.from_pydict(
            {k: [v] for k, v in row.items()}, schema=schema
        )
        os.makedirs(self.path, exist_ok=True)
        pq.write_table(
            table, os.path.join(self.path, f"part-{uuid.uuid4().hex}.parquet")
        )
        return result

    def table(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
