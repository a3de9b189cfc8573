"""Oracle-differential test (SURVEY.md §5.1): every catalog query with an
oracle must match DuckDB on row count, column names, and values at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import os

import pytest

from tools.oracle_check import compare, duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


def _catalog():
    from cassandra_slow_queries_spark.plans.catalog import CATALOG

    return CATALOG


def _deferred():
    from cassandra_slow_queries_spark.plans.catalog import DEFERRED_CATALOG

    return DEFERRED_CATALOG


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", list(_catalog().keys()))
def test_catalog_query(spark, duck, name):
    qd = _catalog()[name]
    df = qd.spark(spark, SF_DIR)
    if qd.oracle is None:
        # rows-only contract: runs, stable schema, row count >= 0
        assert df.count() >= 0
        assert len(df.columns) > 0
        return
    problems = compare(name, df.toPandas(), duck.sql(qd.oracle).df())
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", list(_deferred().keys()))
def test_deferred_query(spark, duck, name):
    # staged-for-promotion entries get the SAME oracle gate as live ones;
    # they must NOT be registered yet (no-slot rule: a never-checked
    # entry would evict a pre-verified one from the rotation window)
    assert name not in _catalog()
    qd = _deferred()[name]
    problems = compare(name, qd.spark(spark, SF_DIR).toPandas(), duck.sql(qd.oracle).df())
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    names = set(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= names
    assert len(oracles) >= 16
