"""Differential certification of every oracle-backed registry query at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

import pytest

from hadoop_stuff_spark.plans.registry import EXTRA_QUERIES, QUERIES
from tests.oracle_harness import compare_query

# full-sweep suite (see pytest.ini): deselected from the default
# driver-facing run, executed via `pytest tests/ -m "" -q`
pytestmark = pytest.mark.slow

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ORACLE_QUERIES = sorted(name for name, spec in ALL_QUERIES.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in ALL_QUERIES.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = ALL_QUERIES[name]
    ok, msg = compare_query(spark, sf_dir, spec.fn, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = ALL_QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.columns
