"""Statement dispatch (SURVEY.md D1-D6): prefix match, case pinning."""

from __future__ import annotations

import pytest

from cassandra_slow_queries_spark.operators.dispatch import statement_type
from tests.conftest import eval_expr


@pytest.mark.parametrize(
    "q,expected",
    [
        ("SELECT * FROM t", "SELECT"),
        ("select 1", "SELECT"),
        ("BEGIN BATCH APPLY", "BATCH"),
        ("begin batch x", "BATCH"),
        ("INSERT INTO t (a) VALUES (1)", "INSERT"),
        ("insert into t", "INSERT"),
        ("DELETE FROM t WHERE x=1", "DELETE"),
        ("UPDATE t SET a=1", "UPDATE"),
        ("update t set a=1", "UPDATE"),
        # mixed case is NOT matched (reference checks only upper/lower
        # prefixes, analyze_slow_queries.py:620) → dropped
        ("Select * from t", None),
        ("TRUNCATE t", None),
        ("", None),
    ],
)
def test_statement_type(spark, q, expected):
    [out] = eval_expr(spark, [(q,)], "q string", statement_type("q"))
    assert out == expected
