"""Table-driven unit tests for the parse expression library (SURVEY.md §5.3).

Expected values are derived from the reference semantics
(analyze_slow_queries.py:295-316 str_slice, :939-983 get_log, :454-476
bound values, :674-694/:754-769 table segments, :506-525 ks.cf split).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions import parse as P
from tests.conftest import eval_expr


@pytest.mark.parametrize(
    "s,before,after,expected",
    [
        ("a FROM tbl WHERE x", " FROM ", " ", "tbl"),
        ("no markers here", " FROM ", " ", None),
        ("a FROM tbl", " FROM ", " ", None),  # after-marker missing → None
        ("x FROM  y", " FROM ", " ", ""),  # empty slice between markers
        ("k FROM a.b; rest", " FROM ", ";", "a.b"),
        # first `before`, first `after` AFTER it
        ("q FROM t1 FROM t2 z", " FROM ", " ", "t1"),
    ],
)
def test_str_slice(spark, s, before, after, expected):
    [out] = eval_expr(spark, [(s,)], "s string", P.str_slice("s", before, after))
    assert out == expected


MSG = (
    "INFO Query too slow, took 1234 ms: [2 bound values] "
    "SELECT * FROM ks.cf WHERE a=? AND b=?; [a:'x', b:'y']"
)


def test_get_log_full(spark):
    [row] = eval_expr(spark, [(MSG,)], "m string", P.get_log("m"))
    assert row["duration"] == "1234"
    assert row["counts"] == "[2 bound values]"
    assert row["query"] == "SELECT * FROM ks.cf WHERE a=? AND b=?;"
    assert row["bound_values"] == "[a:'x', b:'y']"


def test_get_log_no_bound_values(spark):
    msg = "Query too slow, took 10 ms: SELECT x FROM t LIMIT 1"
    [row] = eval_expr(spark, [(msg,)], "m string", P.get_log("m"))
    assert row["duration"] == "10"
    assert row["counts"] is None
    assert row["bound_values"] is None
    assert row["query"] == "SELECT x FROM t LIMIT 1"


def test_get_log_counts_but_no_bv_tail(spark):
    msg = "Query too slow, took 7 ms: [1 bound values] SELECT x FROM t"
    [row] = eval_expr(spark, [(msg,)], "m string", P.get_log("m"))
    assert row["counts"] == "[1 bound values]"
    assert row["bound_values"] is None
    assert row["query"] == "SELECT x FROM t"


def test_get_log_not_slow(spark):
    [row] = eval_expr(spark, [("a normal log line",)], "m string", P.get_log("m"))
    assert row["duration"] is None and row["query"] is None


def test_get_log_missing_ms_marker(spark):
    [row] = eval_expr(
        spark, [("Query too slow, took forever",)], "m string", P.get_log("m")
    )
    assert row["duration"] is None


def test_add_log_columns_matches_get_log(spark):
    """The staged (hot-path) parse must equal the struct expression form
    field-for-field on every grammar edge case."""
    msgs = [
        MSG,
        "Query too slow, took 10 ms: SELECT x FROM t LIMIT 1",
        "Query too slow, took 7 ms: [1 bound values] SELECT x FROM t",
        "a normal log line",
        "Query too slow, took forever",
        "Query too slow, took 5 ms: [truncated output] UPDATE t SET a=1] [x:'1']",
        "W Query too slow, took 1 ms: [0 bound values] DELETE FROM k.t; [a:'b']",
        None,
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "message string")
    struct_rows = df.select(P.get_log("message").alias("s")).collect()
    staged_rows = P.add_log_columns(df).collect()
    for sr, gr in zip(staged_rows, struct_rows):
        assert sr["_duration_str"] == gr.s["duration"]
        assert sr["_counts"] == gr.s["counts"]
        assert sr["_bv_str"] == gr.s["bound_values"]
        assert sr["_raw_query"] == gr.s["query"]


@pytest.mark.parametrize(
    "bv,expected",
    [
        ("[a:'x', b:'y']", {"a": "x", "b": "y"}),
        ("[my_uuid:'9a92-b54f']", {"my_uuid": "9a92-b54f"}),
        # value containing ':' → split on FIRST ':' only
        ("[t:'12:30:00']", {"t": "12:30:00"}),
        # piece without ':' dropped (reference warns + skips)
        ("[garbage, a:'x']", {"a": "x"}),
        # duplicate key → last wins (dict semantics)
        ("[a:'1', a:'2']", {"a": "2"}),
        # unquoted value
        ("[n:42]", {"n": "42"}),
        ("[]", {}),
    ],
)
def test_parse_bound_values(spark, bv, expected):
    [out] = eval_expr(spark, [(bv,)], "s string", P.parse_bound_values("s"))
    assert out == expected


def test_parse_bound_values_null(spark):
    [out] = eval_expr(
        spark,
        [(None,)],
        "s string",
        P.parse_bound_values("s"),
    )
    assert out == {}


@pytest.mark.parametrize(
    "q,expected",
    [
        ("SELECT * FROM ks.cf WHERE x=1", "ks.cf"),
        ("select a from tbl where x=1", "tbl"),
        # no space after 'tbl;' → the (' FROM ', ' ') attempt fails and the
        # (' FROM ', ';') fallback slices 'tbl'
        ("SELECT a FROM tbl;", "tbl"),
        ("SELECT count(*) FROM t2 ", "t2"),
        ("SELECT 1", None),
    ],
)
def test_select_table_segment(spark, q, expected):
    [out] = eval_expr(spark, [(q,)], "q string", P.select_table_segment("q"))
    assert out == expected


@pytest.mark.parametrize(
    "q,expected",
    [
        ("INSERT INTO ks.cf (a) VALUES (1)", "ks.cf"),
        ("insert into tbl (a) values (1)", "tbl"),
        ("INSERT INTO solo", None),  # no trailing space
    ],
)
def test_insert_table_segment(spark, q, expected):
    [out] = eval_expr(spark, [(q,)], "q string", P.insert_table_segment("q"))
    assert out == expected


@pytest.mark.parametrize(
    "t,ks,cf",
    [
        ("KS1.Events", "ks1", "events"),
        ("events", None, "events"),
        ("a.b.c", None, None),  # >2 parts: reference raises → row dropped
    ],
)
def test_split_keyspace_cf(spark, t, ks, cf):
    [out] = eval_expr(spark, [(t,)], "t string", P.split_keyspace_cf("t"))
    assert out["keyspace"] == ks
    assert out["column_family"] == cf


def test_minute_bucket(spark):
    [out] = eval_expr(
        spark,
        [("2024-03-05T04:05:06.789000Z",)],
        "s string",
        P.minute_bucket(P.parse_timestamp("s")),
    )
    assert out == "2024-03-05 04:05"


def test_assemble_primary_key(spark):
    expr = P.assemble_primary_key(F.col("bv"), F.col("pk"))
    data = [
        ({"a": "1", "b": "2"}, ["a", "b"]),
        ({"a": "1"}, ["a", "b"]),  # missing field skipped
        ({}, ["a"]),  # nothing found → ''
        ({"a": "1"}, None),  # no schema row → NULL
    ]
    out = eval_expr(
        spark, data, "bv map<string,string>, pk array<string>", expr
    )
    assert out == ["1-2", "1", "", None]


@pytest.mark.parametrize(
    "q,expected",
    [
        ("DELETE FROM ks.cf WHERE k=1", "ks.cf"),
        ("delete from tbl where k=1", "tbl"),
        ("DELETE c1, c2 FROM ks.cf WHERE k=1", "ks.cf"),
        ("UPDATE ks.cf SET v=1 WHERE k=1", "ks.cf"),
        ("update tbl set v=1 where k=1", "tbl"),
        ("DELETE FROM solo;", "solo"),  # ';'-terminated fallback
        ("UPDATE solo", None),  # no trailing space after table
    ],
)
def test_dml_table_segment(spark, q, expected):
    [out] = eval_expr(spark, [(q,)], "q string", P.dml_table_segment("q"))
    assert out == expected


@pytest.mark.parametrize(
    "msg,expected",
    [
        ("slow query; coordinator /10.0.1.2 replied", "10.0.1.2"),
        ("took 514 ms from 192.168.0.1:9042", "192.168.0.1"),
        ("no address here, v1.2.3 only", None),  # 3-part version ≠ IP
        ("first 1.1.1.1 then 2.2.2.2", "1.1.1.1"),  # first match wins
    ],
)
def test_coordinator_ip(spark, msg, expected):
    [out] = eval_expr(spark, [(msg,)], "q string", P.coordinator_ip("q"))
    assert out == expected
