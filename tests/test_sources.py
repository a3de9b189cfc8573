"""Config loaders (S6) and the hot-key CSV scan (S7/F6)."""

from __future__ import annotations

import json

import pytest

from cassandra_slow_queries_spark.sources.configs import (
    load_query_patterns,
    load_tag_map,
)
from cassandra_slow_queries_spark.sources.csv_keys import read_slow_keys_csv


def test_load_query_patterns(tmp_path):
    p = tmp_path / "patterns.json"
    p.write_text(json.dumps([{"start": "SELECT * FROM t WHERE", "parameters": ["k"]}]))
    assert load_query_patterns(p)[0]["parameters"] == ["k"]
    p.write_text(json.dumps({"start": "x"}))
    with pytest.raises(ValueError, match="array"):
        load_query_patterns(p)
    p.write_text(json.dumps([{"start": "x"}]))
    with pytest.raises(ValueError, match="invalid"):
        load_query_patterns(p)


def test_load_tag_map(tmp_path):
    p = tmp_path / "tags.json"
    p.write_text(json.dumps({"prod": "ks1"}))
    assert load_tag_map(p) == {"prod": "ks1"}
    p.write_text(json.dumps(["nope"]))
    with pytest.raises(ValueError, match="object"):
        load_tag_map(p)


def test_read_slow_keys_csv(spark, tmp_path):
    """Header kept, short/truncated rows dropped (find_pk_nodes.py:26-50)."""
    f = tmp_path / "keys.csv"
    f.write_text(
        "Keyspace,Column Family,Primary Key\n"
        "ks1,cf1,pk1\n"
        "ks1,cf2,\n"                      # missing pk → dropped
        "ks2,cf3,has truncated output\n"  # marker → dropped
        "ks3,cf4,pk4\n"
    )
    rows = read_slow_keys_csv(spark, str(f)).collect()
    assert {(r.keyspace, r.column_family, r.primary_key) for r in rows} == {
        ("ks1", "cf1", "pk1"),
        ("ks3", "cf4", "pk4"),
    }


def test_read_slow_keys_csv_too_few_columns(spark, tmp_path):
    f = tmp_path / "bad.csv"
    f.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="3 CSV columns"):
        read_slow_keys_csv(spark, str(f))
