#!/usr/bin/env python
"""Isolated noop-sink probe: min-of-N wall time for named registry queries.

Usage: python scripts/probe_noop.py [-n RUNS] q1 q2 ...
Fresh tuned session (get_spark, local[$SPARK_GRAFT_CPUS]), per-run forced
GC (python + JVM), noop sink so every column of every row is computed
(guide §1.4). Prints one line per query: name, runs, min, median.
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_stuff_spark.plans.registry import EXTRA_QUERIES, QUERIES
from hadoop_stuff_spark.session import get_spark

ALL = {**QUERIES, **EXTRA_QUERIES}

def main():
    args = sys.argv[1:]
    n = 4
    if args and args[0] == "-n":
        n = int(args[1]); args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-noop")
    spark.sparkContext.setLogLevel("ERROR")
    # session warmup: datasource init + python worker pool + codegen paths
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    out = {}
    for name in args:
        fn = ALL[name].fn
        runs = []
        for i in range(n):
            gc.collect(); spark._jvm.System.gc()
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"probe:{name}:{i}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": runs, "min": min(runs), "median": sorted(runs)[len(runs)//2]}
        print(json.dumps({name: out[name]}), flush=True)

if __name__ == "__main__":
    main()
