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


def test_shard_failure_report(spark, tmp_path):
    """S2 observability: _shards.failed surfaced per file with reasons
    (download_slow_queries.py:110-128 analog); clean files are absent."""
    import json

    from cassandra_slow_queries_spark.sources.kibana import (
        read_kibana_json,
        shard_failure_report,
    )

    def hit(msg):
        return {"_source": {"@timestamp": "2024-01-01T10:00:00.000000Z", "message": msg}}

    bad = {
        "responses": [
            {
                "_shards": {
                    "total": 5,
                    "successful": 3,
                    "failed": 2,
                    "failures": [
                        {"reason": {"reason": "node n1 disconnected"}},
                        {"reason": {"reason": "shard 4 timed out"}},
                    ],
                },
                "hits": {"total": 1, "hits": [hit("x Query too slow, took 5 ms: SELECT 1 FROM a.b x")]},
            }
        ]
    }
    clean = {
        "responses": [
            {
                "_shards": {"total": 5, "successful": 5, "failed": 0},
                "hits": {"total": 0, "hits": []},
            }
        ]
    }
    legacy = {"responses": [{"hits": {"total": 0, "hits": []}}]}  # no _shards at all
    (tmp_path / "bad.json").write_text(json.dumps(bad))
    (tmp_path / "clean.json").write_text(json.dumps(clean))
    (tmp_path / "legacy.json").write_text(json.dumps(legacy))
    paths = [str(tmp_path / n) for n in ("bad.json", "clean.json", "legacy.json")]

    rows = shard_failure_report(spark, paths).collect()
    assert len(rows) == 1
    [r] = rows
    assert r.file.endswith("bad.json") and r.n_failed_shards == 2
    assert sorted(r.reasons) == ["node n1 disconnected", "shard 4 timed out"]
    # the hits path is unaffected by the schema extension
    assert read_kibana_json(spark, paths).count() == 1


def test_parse_cql_one_line_with_clause_does_not_leak_options():
    from cassandra_slow_queries_spark.sources.cql_schema import (
        parse_cql_schema,
    )

    s = parse_cql_schema(
        "CREATE TABLE ks.t (a int, b int, PRIMARY KEY (a, b)) "
        "WITH gc_grace_seconds = 864000;"
    )
    assert s["ks"]["t"] == {"primary_key": ["a"], "clustering_key": ["b"]}
    comp = parse_cql_schema(
        "CREATE TABLE ks.u (a int, b int, c int, PRIMARY KEY ((a, b), c)) "
        "WITH comment = 'x';"
    )
    assert comp["ks"]["u"] == {
        "primary_key": ["a", "b"],
        "clustering_key": ["c"],
    }


def test_parse_cql_compact_table_name_no_space():
    from cassandra_slow_queries_spark.sources.cql_schema import (
        parse_cql_schema,
    )

    s = parse_cql_schema(
        "CREATE TABLE ks.cf(id int, v text,\n    PRIMARY KEY (id)\n);"
    )
    assert s["ks"]["cf"]["primary_key"] == ["id"]
