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
        **lint_kwargs,
    ):
        """Execute ``df`` (``action`` defaults to collect), log one row,
        return the action's result."""
        action = action or (lambda d: d.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        findings = lint_plan(df, **lint_kwargs)
        t0 = time.time()
        result = action(df)
        wall = time.time() - t0
        n_rows = len(result) if hasattr(result, "__len__") else -1
        row = [
            (
                name,
                float(round(wall, 4)),
                int(n_rows),
                int(plan.count("Exchange ")),
                [f"{r}:{e}" for r, e in findings],
                datetime.now(timezone.utc).isoformat(),
            )
        ]
        (
            self.spark.createDataFrame(
                row,
                "name string, wall_s double, n_rows long, n_exchanges long, "
                "lint array<string>, at string",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(self.path)
        )
        return result

    def table(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
