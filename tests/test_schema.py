"""CQL DDL parser + dimension builders (SURVEY.md S5/P10, J2)."""

from __future__ import annotations

import pytest

from cassandra_slow_queries_spark.sources.cql_schema import (
    cf_keyspace_dimension,
    parse_cql_schema,
    schema_dimension,
)

DDL = """
CREATE TABLE ks1.users (
    user_id uuid PRIMARY KEY,
    name text
);
CREATE TABLE ks1.events (
    a text, b text, c text, d text,
    PRIMARY KEY (a, b, c)
);
CREATE TABLE ks2.wide (
    a text, b text, c text, d text,
    PRIMARY KEY ((a, b), c)
);
CREATE TABLE ks3.users (
    user_id uuid PRIMARY KEY,
    x text
);
"""


def test_parse_inline_pk():
    schema = parse_cql_schema(DDL)
    assert schema["ks1"]["users"] == {
        "primary_key": ["user_id"],
        "clustering_key": [],
    }


def test_parse_flat_pk():
    schema = parse_cql_schema(DDL)
    assert schema["ks1"]["events"] == {
        "primary_key": ["a"],
        "clustering_key": ["b", "c"],
    }


def test_parse_composite_pk():
    schema = parse_cql_schema(DDL)
    assert schema["ks2"]["wide"] == {
        "primary_key": ["a", "b"],
        "clustering_key": ["c"],
    }


def test_parse_one_line_create_table():
    # Compact (valid CQL) one-line statements: CREATE TABLE and PRIMARY
    # KEY share a line. Round-7 verify found these silently parsed the
    # column list into the key arrays; they must parse like multi-line.
    ddl = (
        "CREATE TABLE ks0.cf0 (pk int, c int, v text, PRIMARY KEY (pk, c));\n"
        "CREATE TABLE ks1.cf1 (id uuid PRIMARY KEY, v text);\n"
        "CREATE TABLE ks2.wide (a text, b text, c text, "
        "PRIMARY KEY ((a, b), c));\n"
    )
    schema = parse_cql_schema(ddl)
    assert schema["ks0"]["cf0"] == {
        "primary_key": ["pk"],
        "clustering_key": ["c"],
    }
    assert schema["ks1"]["cf1"] == {
        "primary_key": ["id"],
        "clustering_key": [],
    }
    assert schema["ks2"]["wide"] == {
        "primary_key": ["a", "b"],
        "clustering_key": ["c"],
    }


def test_orphan_primary_key_raises():
    with pytest.raises(ValueError):
        parse_cql_schema("PRIMARY KEY (a, b)")


def test_schema_dimension(spark):
    dim = schema_dimension(spark, parse_cql_schema(DDL))
    rows = {(r.keyspace, r.column_family): r for r in dim.collect()}
    assert rows[("ks2", "wide")].primary_key == ["a", "b"]
    assert rows[("ks1", "events")].clustering_key == ["b", "c"]


def test_cf_keyspace_collision_poisoned(spark):
    dim = cf_keyspace_dimension(spark, parse_cql_schema(DDL))
    guesses = {r.column_family: r.guessed_keyspace for r in dim.collect()}
    # 'users' exists in ks1 and ks3 → 'unknown' (reference :553-567)
    assert guesses["users"] == "unknown"
    assert guesses["events"] == "ks1"
    assert guesses["wide"] == "ks2"
