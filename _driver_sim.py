from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
import __spark_entry__ as E
print("entry rows:", len(E.entry(spark).collect()))
from tests.oracle_harness import compare_query
qs, oracles = E.queries(), E.oracle_sql()
SF = "/root/testdata/sf0.01"
fails = 0
for name, fn in sorted(qs.items()):
    if name in oracles:
        ok, msg = compare_query(spark, SF, fn, oracles[name])
        if not ok: fails += 1
        print(("OK " if ok else "FAIL"), name, msg)
    else:
        print("ROWS", name, fn(spark, SF).count())
print("FAILS:", fails)
