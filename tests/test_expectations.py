"""Unit tests for the declarative expectation suite
(operators/expectations.py); the orders-table catalog entry is
oracle-checked by test_entry_oracle.py like every other entry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.expectations import ExpectationSuite


def _report(df):
    return {r["check"]: r.asDict() for r in df.collect()}


def test_ratio_and_unique_checks(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 15.0), (3, None, 25.0), (4, "b", -1.0)],
        "id: long, grp: string, v: double",
    )
    rep = _report(
        ExpectationSuite()
        .expect_complete("grp", min_ratio=0.5)
        .expect_between("v", 0, 20, min_ratio=0.5)
        .expect_in_set("grp", ["a", "b"], min_ratio=0.9)
        .expect_unique("id")
        .expect_unique("grp", min_ratio=0.9)
        .expect_row_count(min_rows=2, max_rows=10)
        .run(df)
    )
    assert rep["complete(grp)"]["metric"] == 0.75
    assert rep["complete(grp)"]["passed"] is True
    assert rep["between(v)"]["metric"] == 0.5  # -1 and 25 out of range
    assert rep["between(v)"]["passed"] is True
    # NULL grp fails the in_set predicate: 3/4 < 0.9
    assert rep["in_set(grp)"]["metric"] == 0.75
    assert rep["in_set(grp)"]["passed"] is False
    assert rep["unique(id)"]["metric"] == 1.0
    assert rep["unique(id)"]["passed"] is True
    # COUNT(DISTINCT grp)=2 over 4 rows
    assert rep["unique(grp)"]["metric"] == 0.5
    assert rep["unique(grp)"]["passed"] is False
    assert rep["row_count"]["metric"] == 4.0
    assert rep["row_count"]["passed"] is True


def test_null_fails_between_but_configurable_via_satisfies(spark):
    df = spark.createDataFrame([(None,), (10.0,)], "v: double")
    rep = _report(
        ExpectationSuite()
        .expect_between("v", 0, 100)
        .expect_satisfies("v_null_or_ranged", F.col("v").isNull() | F.col("v").between(0, 100))
        .run(df)
    )
    assert rep["between(v)"]["metric"] == 0.5
    assert rep["between(v)"]["passed"] is False
    assert rep["satisfies(v_null_or_ranged)"]["metric"] == 1.0
    assert rep["satisfies(v_null_or_ranged)"]["passed"] is True


def test_empty_table_ratios_vacuous_row_count_fails(spark):
    df = spark.createDataFrame([], "id: long, v: double")
    rep = _report(
        ExpectationSuite()
        .expect_complete("v")
        .expect_unique("id")
        .expect_row_count(min_rows=1)
        .run(df)
    )
    assert rep["complete(v)"]["metric"] == 1.0
    assert rep["complete(v)"]["passed"] is True
    assert rep["unique(id)"]["metric"] == 1.0
    assert rep["row_count"]["metric"] == 0.0
    assert rep["row_count"]["passed"] is False


def test_row_count_max_bound(spark):
    df = spark.range(5)
    rep = _report(
        ExpectationSuite().expect_row_count(min_rows=1, max_rows=3).run(df)
    )
    assert rep["row_count"]["passed"] is False


def test_empty_suite_raises(spark):
    with pytest.raises(ValueError):
        ExpectationSuite().run(spark.range(1))


def test_single_aggregation_plan_without_uniques(spark):
    """All ratio checks compile into ONE aggregate over the input: the
    optimized plan contains no join (no crossJoin branch) when no
    uniqueness check is declared."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    out = (
        ExpectationSuite()
        .expect_complete("m")
        .expect_between("m", 0, 6)
        .expect_row_count(min_rows=1)
        .run(df)
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_all_null_predicate_column_fails_not_vacuous_pass(spark):
    # SUM over an all-NULL predicate is NULL, which used to fall into
    # the empty-table vacuous-1.0 branch: a 0%-in-set column PASSED
    from cassandra_slow_queries_spark.operators.expectations import (
        ExpectationSuite,
    )

    df = spark.createDataFrame([(None,), (None,)], "status string")
    [r] = (
        ExpectationSuite()
        .expect_in_set("status", ["A", "B"])
        .run(df)
        .collect()
    )
    assert r["metric"] == 0.0
    assert r["passed"] is False
