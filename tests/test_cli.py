"""CLI parity e2e (VERDICT r1 gap #1): the reference's three-command
workflow via ``python -m cassandra_slow_queries_spark``."""

from __future__ import annotations

import json
import os

from cassandra_slow_queries_spark.__main__ import main

DDL = """
CREATE TABLE ks1.events (
    a text,
    b text,
    PRIMARY KEY (a, b)
);
"""


def _kibana_fixture(tmp_path):
    msgs = []
    for i in range(8):
        msgs.append(
            {
                "_source": {
                    "@timestamp": f"2024-01-01T10:00:{i:02d}.123456Z",
                    "message": (
                        f"INFO Query too slow, took {100 + i} ms: "
                        "[1 bound values] SELECT * FROM ks1.events "
                        f"WHERE a=? LIMIT 10; [a:'v{i % 2}']"
                    ),
                    "tags": ["prod"],
                }
            }
        )
    doc = {"responses": [{"hits": {"total": len(msgs), "hits": msgs}}]}
    path = tmp_path / "page0.json"
    path.write_text(json.dumps(doc))
    return str(path)


def test_cli_analyze_writes_five_reports(spark, tmp_path):
    schema_file = tmp_path / "schema.cql"
    schema_file.write_text(DDL)
    tags_file = tmp_path / "tags.json"
    tags_file.write_text(json.dumps({"prod": "ks1"}))
    out = str(tmp_path / "reports")
    rc = main(
        [
            "analyze",
            _kibana_fixture(tmp_path),
            "--schema",
            str(schema_file),
            "--tags",
            str(tags_file),
            "--min-count",
            "2",
            "--out",
            out,
            "--run-tag",
            "run1",
        ]
    )
    assert rc == 0
    # reports land in the per-run folder (reference TODO :63)
    out = os.path.join(out, "run1")
    expected_headers = {
        "slow_queries": "Count,Duration,Avg. Duration,Query",
        "slow_primary_keys": "Count,Duration,Avg. Duration,Primary Key,Query",
        "primary_keys": (
            "Count,Duration,Avg. Duration,Keyspace,Column Family,Primary Key"
        ),
        "volume": "Time,Count,Duration,Avg. Duration",
        "volume_top_n": (
            "Time,Count,Duration,Avg. Duration,Primary Key,Query"
        ),
    }
    for name, header in expected_headers.items():
        files = [
            f
            for f in os.listdir(os.path.join(out, name))
            if f.endswith(".csv")
        ]
        assert files, f"no CSV for {name}"
        lines = open(os.path.join(out, name, files[0])).read().splitlines()
        assert lines[0] == header
    # the 8 SELECTs aggregate to one query row
    q_dir = os.path.join(out, "slow_queries")
    [q_csv] = [f for f in os.listdir(q_dir) if f.endswith(".csv")]
    rows = open(os.path.join(q_dir, q_csv)).read().splitlines()[1:]
    assert len(rows) == 1 and rows[0].startswith("8,")


def test_write_reports_default_dated_folder(spark, tmp_path):
    """Without a run tag, reports land in a second+microsecond-precision
    dated folder — so successive untagged runs never collide, even
    within the same minute — and never overwrite each other (reference
    TODO analyze_slow_queries.py:62-63)."""
    import re

    from cassandra_slow_queries_spark.plans.reports import (
        run_folder_name,
        write_reports,
    )

    stamp = r"\d{4}-\d{2}-\d{2}_\d{6}\.\d{6}"
    assert re.fullmatch(stamp, run_folder_name())
    # two calls in the same minute produce distinct folder names
    assert run_folder_name() != run_folder_name()
    df = spark.createDataFrame(
        [(3, 300, 100, "SELECT q")], "count long, duration long, avg_duration long, query string"
    )
    out = str(tmp_path / "reports")
    run_dir = write_reports({"query": df}, out)
    name = os.path.basename(run_dir)
    assert re.fullmatch(stamp, name)
    files = os.listdir(os.path.join(run_dir, "slow_queries"))
    assert any(f.endswith(".csv") for f in files)
    # explicit tags separate runs
    d1 = write_reports({"query": df}, out, run_tag="a")
    d2 = write_reports({"query": df}, out, run_tag="b")
    assert d1 != d2 and os.path.isdir(d1) and os.path.isdir(d2)


def test_cli_find_pk_nodes_stdout(spark, tmp_path, capsys):
    csv_file = tmp_path / "keys.csv"
    csv_file.write_text(
        "Keyspace,Column Family,Primary Key\n"
        "ks1,cf1,pk1\n"
        "ks1,cf1,truncated output...\n"
        "ks2,cf2,pk2\n"
    )
    rc = main(["find-pk-nodes", str(csv_file), "--n-nodes", "6", "--rf", "3"])
    assert rc == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    header = out_lines[0].split(",")
    assert header[:3] == ["Keyspace", "Column Family", "Primary Key"]
    assert header[3:] == [f"Endpoint{i}" for i in range(6)]
    body = sorted(out_lines[1:])
    assert len(body) == 2  # truncated row filtered (F6)
    assert body[0].startswith("ks1,cf1,pk1,node")


def test_cli_plan_download_manifest(tmp_path):
    out = tmp_path / "plan.json"
    rc = main(
        [
            "plan-download",
            "--url",
            "http://localhost:9200",
            "--index",
            "logs-*",
            "--start",
            "2024-01-01T05:00:00",
            "--end",
            "2024-01-01T12:00:00",
            "--size",
            "1000",
            "--total-hits",
            "2500",
            "--out",
            str(out),
        ]
    )
    assert rc == 0
    manifest = json.loads(out.read_text())
    assert manifest["total_hits"] == 2500
    assert len(manifest["pages"]) == 3  # ceil(2500/1000)
    for i, page in enumerate(manifest["pages"]):
        body = json.loads(page["ndjson"].splitlines()[1])
        assert body["from"] == i * 1000 and body["size"] == 1000
        assert page["filename"]
    # missing total and sample → actionable error, not a crash
    rc2 = main(
        [
            "plan-download",
            "--url",
            "http://localhost:9200",
            "--index",
            "logs-*",
            "--start",
            "2024-01-01T05:00:00",
            "--end",
            "2024-01-01T12:00:00",
        ]
    )
    assert rc2 == 2
