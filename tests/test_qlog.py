"""Query log: executions land as queryable rows with timing, row counts,
and lint findings."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.plans.qlog import QueryLog


def test_query_log_records_runs_and_findings(spark, sf_dir, tmp_path):
    log = QueryLog(spark, str(tmp_path / "qlog"))
    orders = load_table(spark, sf_dir, "orders")

    rows = log.run("topk", orders.orderBy(F.desc("o_totalprice")).limit(3))
    assert len(rows) == 3

    # a deliberately bad plan: findings recorded, run still succeeds
    a = spark.range(50)
    b = spark.range(4).withColumnRenamed("id", "id2")
    log.run("cartesian_oops", a.crossJoin(b))

    t = log.table().collect()
    by_name = {r.name: r for r in t}
    assert by_name["topk"].n_rows == 3 and by_name["topk"].wall_s > 0
    assert by_name["topk"].lint == []
    assert any(s.startswith("cartesian:") for s in by_name["cartesian_oops"].lint)
    assert by_name["cartesian_oops"].n_rows == 200
