"""Shared Spark fixture (session-scoped: one JVM for the whole run)."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")


@pytest.fixture(scope="session")
def spark():
    from cassandra_slow_queries_spark import get_spark

    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def eval_expr(spark, data, schema, expr):
    """Evaluate a Column expression over literal rows; return list of values."""
    df = spark.createDataFrame(data, schema)
    return [r[0] for r in df.select(expr.alias("out")).collect()]
