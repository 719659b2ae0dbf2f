#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to plans/<outdir>/.

Usage: python scripts/dump_plans.py <outdir-suffix e.g. r13> <before|after> q1 q2 ...
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_stuff_spark.plans.registry import EXTRA_QUERIES, QUERIES
from hadoop_stuff_spark.session import get_spark

ALL = {**QUERIES, **EXTRA_QUERIES}

def main():
    outdir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = ALL[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(dest, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        print(f"{name}: Exchange={txt.count('Exchange')} Scans={txt.count('Scan parquet')} "
              f"Arrow={txt.count('ArrowEvalPython')+txt.count('MapInPandas')+txt.count('FlatMapGroupsInPandas')} -> {path}")

if __name__ == "__main__":
    main()
