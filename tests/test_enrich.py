"""Enrichment operators: pattern rewrite (P9/J4), keyspace resolution
(J2/J3), PK assembly guard (F4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.operators.enrich import (
    apply_query_patterns,
    attach_primary_key,
    resolve_keyspace_cf,
)
from tests.conftest import eval_expr

PATTERNS = [
    {"start": "SELECT * FROM users WHERE user_id", "parameters": ["user_id"]},
    {"start": "SELECT * FROM t2", "parameters": ["a", "b"]},
]


def _rewrite(spark, query, patterns=PATTERNS):
    [out] = eval_expr(
        spark, [(query,)], "q string", apply_query_patterns(F.col("q"), patterns)
    )
    return out


def test_pattern_rewrite_basic(spark):
    out = _rewrite(spark, "SELECT * FROM users WHERE user_id='u-1' LIMIT 5")
    assert out["query"] == "SELECT * FROM users WHERE user_id=? LIMIT 5"
    assert out["bound_values"] == {"user_id": "u-1"}


def test_pattern_rewrite_no_match_is_identity(spark):
    q = "SELECT * FROM other WHERE x=1"
    out = _rewrite(spark, q)
    assert out["query"] == q
    assert out["bound_values"] == {}


def test_pattern_rewrite_first_match_wins(spark):
    # both patterns' prefixes could rewrite; only the first listed applies
    out = _rewrite(
        spark,
        "SELECT * FROM users WHERE user_id=42 AND a=7 ;",
        [
            {"start": "SELECT * FROM users", "parameters": ["user_id"]},
            {"start": "SELECT * FROM users WHERE", "parameters": ["a"]},
        ],
    )
    assert out["bound_values"] == {"user_id": "42"}
    assert "a=7" in out["query"]


def test_pattern_rewrite_multi_param_sequential(spark):
    out = _rewrite(spark, "SELECT * FROM t2 WHERE a=1 AND b=2 ;")
    # str.replace is global: replacing value '2' also rewrites the '2' in
    # 't2' — faithful to the reference (analyze_slow_queries.py:886)
    assert out["query"] == "SELECT * FROM t? WHERE a=? AND b=? ;"
    assert out["bound_values"] == {"a": "1", "b": "2"}


def test_pattern_rewrite_value_replaced_globally(spark):
    # str.replace replaces every occurrence of the value text
    out = _rewrite(
        spark,
        "SELECT * FROM t2 WHERE a=9 AND b=9 ;",
        [{"start": "SELECT * FROM t2", "parameters": ["a"]}],
    )
    assert out["query"] == "SELECT * FROM t2 WHERE a=? AND b=? ;"
    assert out["bound_values"] == {"a": "9"}


def test_pattern_rewrite_no_terminator_skips_param(spark):
    # value runs to end of string with no space/comma/semicolon
    out = _rewrite(
        spark,
        "SELECT * FROM t2 WHERE a=123",
        [{"start": "SELECT * FROM t2", "parameters": ["a"]}],
    )
    assert out["query"] == "SELECT * FROM t2 WHERE a=123"
    assert out["bound_values"] == {}


def test_pattern_quotes_stripped_and_name_lowercased(spark):
    out = _rewrite(
        spark,
        "SELECT * FROM t2 WHERE ID='abc' ;",
        [{"start": "SELECT * FROM t2", "parameters": ["ID"]}],
    )
    assert out["bound_values"] == {"id": "abc"}


SCHEMA = {
    "ks1": {"events": {"primary_key": ["a", "b"], "clustering_key": []}},
    "ks2": {"shared": {"primary_key": ["x"], "clustering_key": []}},
    "ks3": {"shared": {"primary_key": ["x"], "clustering_key": []}},
}


def _resolve(spark, table, tags, config):
    df = spark.createDataFrame(
        [(table, tags)], "table_segment string, tags array<string>"
    )
    return resolve_keyspace_cf(df, spark, config).select(
        "keyspace", "column_family"
    ).collect()[0]


def test_resolve_explicit_ks_cf(spark):
    cfg = AnalysisConfig(schema=SCHEMA)
    row = _resolve(spark, "KS9.Tbl", [], cfg)
    assert (row.keyspace, row.column_family) == ("ks9", "tbl")


def test_resolve_bare_cf_via_schema_guess(spark):
    cfg = AnalysisConfig(schema=SCHEMA)
    row = _resolve(spark, "events", [], cfg)
    assert (row.keyspace, row.column_family) == ("ks1", "events")


def test_resolve_collision_poisoned_then_tag_fallback(spark):
    cfg = AnalysisConfig(schema=SCHEMA, tags={"cluster-a": "ks2"})
    row = _resolve(spark, "shared", ["other", "cluster-a"], cfg)
    assert (row.keyspace, row.column_family) == ("ks2", "shared")


def test_resolve_collision_without_tags_stays_unknown(spark):
    cfg = AnalysisConfig(schema=SCHEMA)
    row = _resolve(spark, "shared", [], cfg)
    assert (row.keyspace, row.column_family) == ("unknown", "shared")


def test_resolve_unknown_cf_no_tags(spark):
    cfg = AnalysisConfig(schema=SCHEMA)
    row = _resolve(spark, "mystery", [], cfg)
    assert row.keyspace is None
    assert row.column_family == "mystery"


def test_attach_primary_key_guard(spark):
    cfg = AnalysisConfig(schema=SCHEMA)
    df = spark.createDataFrame(
        [
            ("ks1", "events", {"a": "1", "b": "2"}),  # full match
            ("ks1", "events", {"b": "2"}),  # missing field skipped → '2'
            ("ks1", "events", {}),  # empty bound values → NULL (guard)
            ("ks9", "nope", {"a": "1"}),  # no schema row → NULL
            (None, "events", {"a": "1"}),  # no keyspace → NULL
        ],
        "keyspace string, column_family string, bound_values map<string,string>",
    )
    out = attach_primary_key(df, spark, cfg).select("primary_key").collect()
    assert [r.primary_key for r in out] == ["1-2", "2", None, None, None]


def test_resolve_keyspace_cf_rejects_non_string_tags(spark):
    """Malformed tags config (tag -> tuple instead of keyspace string)
    must fail with the contract, not Spark's opaque
    UNSUPPORTED_FEATURE.LITERAL_TYPE at plan time (found by the r9
    verify drive)."""
    import pytest

    from cassandra_slow_queries_spark.config import AnalysisConfig
    from cassandra_slow_queries_spark.operators.enrich import (
        resolve_keyspace_cf,
    )

    df = spark.createDataFrame(
        [("t1", ["prod"])], "table_segment string, tags array<string>"
    )
    cfg = AnalysisConfig(schema={}, tags={"prod": ("ks1", "events")})
    with pytest.raises(TypeError, match="keyspace string"):
        resolve_keyspace_cf(df, spark, cfg)
