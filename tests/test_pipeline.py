"""Golden end-to-end pipeline test (SURVEY.md §5.2): synthetic Kibana JSON
through scan → parse → dispatch → enrich → five reports, with exact
expected values pinning truncating avg, min_count HAVING, per-minute
top-K, and the '@message' / tags fallbacks."""

from __future__ import annotations

import json

import pytest

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.plans.pipeline import parse_messages, run_analysis
from cassandra_slow_queries_spark.plans.reports import shape_report
from cassandra_slow_queries_spark.sources.kibana import read_kibana_json

SCHEMA = {"ks1": {"events": {"primary_key": ["a"], "clustering_key": ["b"]}}}


def _hit(ts, msg=None, tags=None, at_message=None):
    src = {"@timestamp": ts}
    if msg is not None:
        src["message"] = msg
    if at_message is not None:
        src["@message"] = at_message
    if tags is not None:
        src["tags"] = tags
    return {"_source": src}


@pytest.fixture(scope="module")
def kibana_file(tmp_path_factory):
    msgs = []
    for i in range(12):
        msgs.append(
            _hit(
                f"2024-01-01T10:{i % 3:02d}:{i:02d}.123456Z",
                f"INFO Query too slow, took {100 + i} ms: [1 bound values] "
                f"SELECT * FROM ks1.events WHERE a=? LIMIT 10; [a:'v{i % 2}']",
                ["prod"],
            )
        )
    # @message fallback row (reference :1287-1290)
    msgs.append(
        _hit(
            "2024-01-01T10:00:30.000000Z",
            at_message="x Query too slow, took 40 ms: SELECT 1 FROM ks1.events x",
        )
    )
    # INSERT / BATCH / non-slow / unknown-statement rows
    msgs.append(
        _hit(
            "2024-01-01T10:00:59.000000Z",
            "x Query too slow, took 50 ms: INSERT INTO ks1.events (a) VALUES (9)",
            [],
        )
    )
    msgs.append(
        _hit(
            "2024-01-01T10:01:59.000000Z",
            "x Query too slow, took 70 ms: BEGIN BATCH APPLY",
            [],
        )
    )
    msgs.append(_hit("2024-01-01T10:01:59.500000Z", "a normal log line"))
    msgs.append(
        _hit(
            "2024-01-01T10:01:59.600000Z",
            "x Query too slow, took 10 ms: TRUNCATE ks1.events",
        )
    )
    # malformed-timestamp row: reference catches strptime and skips the
    # row (:1296-1300); ANSI to_timestamp would abort the whole job here
    msgs.append(
        _hit(
            "2024-01-01T99:99:99",
            "x Query too slow, took 55 ms: SELECT * FROM ks1.events WHERE a=? LIMIT 10;",
        )
    )
    # non-integer duration: reference int() raises and the row is skipped;
    # ANSI cast('long') would abort the whole job here
    msgs.append(
        _hit(
            "2024-01-01T10:01:59.700000Z",
            "x Query too slow, took 12.5 ms: SELECT * FROM ks1.events WHERE a=? LIMIT 10;",
        )
    )
    doc = {"responses": [{"hits": {"total": len(msgs), "hits": msgs}}]}
    path = tmp_path_factory.mktemp("kibana") / "page0.json"
    path.write_text(json.dumps(doc))
    return str(path)


@pytest.fixture(scope="module")
def reports(spark, kibana_file):
    cfg = AnalysisConfig(min_count=2, schema=SCHEMA, tags={"prod": "ks1"})
    raw = read_kibana_json(spark, kibana_file)
    return run_analysis(spark, raw, cfg)


def test_raw_filter_drops_non_slow(spark, kibana_file):
    raw = read_kibana_json(spark, kibana_file)
    # 19 hits, 1 non-slow line filtered by the contains() scan filter
    assert raw.count() == 18


def test_parse_drops_unknown_statement(spark, kibana_file):
    cfg = AnalysisConfig(min_count=2, schema=SCHEMA)
    fact = parse_messages(read_kibana_json(spark, kibana_file), spark, cfg)
    # TRUNCATE row dropped (no processor, reference :932-934); bad-ts and
    # bad-duration rows dropped by the validity filter, not a job abort
    assert fact.count() == 15
    types = {r.type for r in fact.select("type").distinct().collect()}
    assert types == {"SELECT", "INSERT", "BATCH"}


def test_query_report_golden(reports):
    rows = {r.query: r for r in reports["query"].collect()}
    sel = rows["SELECT * FROM ks1.events WHERE a=? LIMIT 10;"]
    assert (sel["count"], sel.duration, sel.avg_duration) == (12, 1266, 105)
    assert (sel.keyspace, sel.column_family) == ("ks1", "events")
    # min_count=2 HAVING drops the single INSERT/BATCH/@message rows
    assert len(rows) == 1


def test_query_pk_report_golden(reports):
    rows = {r.primary_key: r for r in reports["query_pk"].collect()}
    assert (rows["v0"]["count"], rows["v0"].duration, rows["v0"].avg_duration) == (
        6,
        630,
        105,
    )
    assert (rows["v1"]["count"], rows["v1"].duration) == (6, 636)


def test_primary_key_report_golden(reports):
    rows = {r.primary_key: r for r in reports["primary_key"].collect()}
    assert rows["v0"].keyspace == "ks1"
    assert rows["v0"].column_family == "events"
    assert rows["v1"]["count"] == 6


def test_volume_report_sorted_and_filtered(reports):
    rows = reports["volume"].collect()
    assert [r.minute for r in rows] == [
        "2024-01-01 10:00",
        "2024-01-01 10:01",
        "2024-01-01 10:02",
    ]
    by_min = {r.minute: r for r in rows}
    # 10:00 → 4 SELECTs (i=0,3,6,9) + @message row + INSERT = 6 rows
    assert by_min["2024-01-01 10:00"]["count"] == 6
    # truncating average (reference :1093-1104)
    assert by_min["2024-01-01 10:00"].avg_duration == (
        by_min["2024-01-01 10:00"].duration // 6
    )


def test_volume_top_report_golden(reports):
    rows = reports["volume_top"].collect()
    # per-minute cells with count>=2: the two SELECT pk cells per minute
    assert all(r["count"] == 2 for r in rows)
    minutes = [r.minute for r in rows]
    assert minutes == sorted(minutes)


def test_report_shapes(reports):
    assert shape_report(reports["query"], "query").columns == [
        "Count",
        "Duration",
        "Avg. Duration",
        "Query",
    ]
    assert shape_report(reports["volume_top"], "volume_top").columns == [
        "Time",
        "Count",
        "Duration",
        "Avg. Duration",
        "Primary Key",
        "Query",
    ]


@pytest.mark.parametrize("order_by", ["duration", "count", "avg_duration"])
def test_grouping_sets_variant_equals_fanout(spark, kibana_file, order_by):
    """The single-shuffle GROUPING SETS five-report variant must produce
    exactly the frames of the persist-once fan-out (SURVEY.md §4) under
    every configurable sort key."""
    from cassandra_slow_queries_spark.operators.aggregates import (
        five_reports,
        five_reports_shared_shuffle,
    )
    from cassandra_slow_queries_spark.plans.pipeline import parse_messages

    cfg = AnalysisConfig(
        min_count=2, schema=SCHEMA, tags={"prod": "ks1"}, order_by=order_by
    )
    fact = parse_messages(
        read_kibana_json(spark, kibana_file), spark, cfg
    ).persist()
    fan = five_reports(fact, cfg)
    shared = five_reports_shared_shuffle(fact, cfg)
    try:
        for name in fan:
            a = [tuple(r) for r in fan[name].collect()]
            b = [tuple(r) for r in shared[name].collect()]
            assert a == b, f"report {name} diverged"
            assert fan[name].columns == shared[name].columns
    finally:
        fact.unpersist()


def test_observation_and_incident_report(spark, kibana_file):
    from pyspark.sql import Observation

    from cassandra_slow_queries_spark.plans.pipeline import incident_report

    cfg = AnalysisConfig(min_count=2, schema=SCHEMA, tags={"prod": "ks1"})
    raw = read_kibana_json(spark, kibana_file)
    obs = Observation("parse_metrics")
    fact = parse_messages(raw, spark, cfg, observation=obs, with_incidents=True)
    fact.count()  # action → metrics materialize
    m = obs.get
    # 18 slow-marker rows reach the parser (12 SELECTs + @message fallback
    # + INSERT + BATCH + TRUNCATE + bad-ts + bad-duration; the non-slow
    # line is excluded)
    assert m["n_input"] == 18
    assert m["n_unknown_statement"] == 1  # TRUNCATE
    # malformed rows are COUNTED, not job-aborting (try_to_timestamp /
    # try_cast — the reference's per-row catch-and-skip)
    assert m["n_bad_ts"] == 1 and m["n_bad_grammar"] == 1
    assert m["n_parsed"] == 15

    inc = {r.incident: r["count"] for r in incident_report(fact).collect()}
    # the '@message' SELECT has no FROM-terminating match → 'SELECT 1 ...x'
    # parses a table segment but ks1.events schema misses pk 'a' in bound
    # values? no — it has no bound values: segment resolves, pk assembly
    # yields '' (schema hit, no fields found), so no incident; the INSERT
    # row resolves fully. Expect no silent incident categories beyond
    # those constructed here.
    for name in inc:
        assert name in {
            "no table segment in query",
            "unable to resolve keyspace/column family",
            "no schema entry for keyspace.column_family",
            "bad bound values",
        }


def test_ignored_column_families_filter(spark, kibana_file):
    """Reference TODO:61 — configured noise CFs are dropped after
    enrichment; both bare-cf and ks.cf-qualified forms work, and rows
    with unresolved cf are never touched."""
    base = AnalysisConfig(min_count=1, schema=SCHEMA, tags={"prod": "ks1"})
    raw = read_kibana_json(spark, kibana_file)
    full = parse_messages(raw, spark, base)
    assert full.filter("column_family = 'events'").count() > 0
    unresolved = full.filter("column_family IS NULL").count()

    for ignore in (("events",), ("ks1.events",), ("EVENTS",)):
        cfg = AnalysisConfig(
            min_count=1, schema=SCHEMA, tags={"prod": "ks1"},
            ignored_column_families=ignore,
        )
        got = parse_messages(raw, spark, cfg)
        assert got.filter("column_family = 'events'").count() == 0, ignore
        # BATCH/unknown-cf rows survive
        assert got.filter("column_family IS NULL").count() == unresolved

    other = AnalysisConfig(
        min_count=1, schema=SCHEMA, tags={"prod": "ks1"},
        ignored_column_families=("ks2.events", "other_cf"),
    )
    assert parse_messages(raw, spark, other).count() == full.count()


def test_report_timezone_shifts_buckets_only(spark, kibana_file):
    """Reference TODO:58 — report buckets render in the configured zone;
    counts and durations are unchanged (ts stays the UTC instant)."""
    from cassandra_slow_queries_spark.plans.pipeline import run_analysis as ra

    raw = read_kibana_json(spark, kibana_file)
    utc = ra(
        spark, raw,
        AnalysisConfig(min_count=1, schema=SCHEMA, tags={"prod": "ks1"}),
    )["volume"].collect()
    # fixed-offset zone: no DST ambiguity in the assertion
    shifted = ra(
        spark, raw,
        AnalysisConfig(
            min_count=1, schema=SCHEMA, tags={"prod": "ks1"},
            report_timezone="UTC+05:30",
        ),
    )["volume"].collect()
    assert sorted((r["count"], r["duration"]) for r in utc) == sorted(
        (r["count"], r["duration"]) for r in shifted
    )
    # every shifted bucket is exactly +5:30 from some UTC bucket
    from datetime import datetime, timedelta

    fmt = "%Y-%m-%d %H:%M"
    utc_buckets = {r.minute for r in utc}
    for r in shifted:
        back = (
            datetime.strptime(r.minute, fmt) - timedelta(hours=5, minutes=30)
        ).strftime(fmt)
        assert back in utc_buckets
