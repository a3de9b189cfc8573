"""S1/S2 + P13-P15 extraction planning (pure functions, no network)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from cassandra_slow_queries_spark.sources.es_extract import (
    DEFAULT_SIZE,
    build_request_body,
    build_request_header,
    get_time_interval,
    page_filename,
    parse_curl_command,
    peek_total_hits,
    plan_extraction,
    plan_pages,
)

TODAY = datetime(2026, 8, 13, 9, 30, 45)


def test_time_interval_defaults_to_5am_noon():
    start, end = get_time_interval(today=TODAY)
    assert (start.hour, start.minute, start.second) == (5, 0, 0)
    assert (end.hour, end.minute, end.second) == (12, 0, 0)
    assert start.date() == end.date() == TODAY.date()


def test_time_interval_time_only_gets_today():
    start, end = get_time_interval("10:00:00", "11:30:00", today=TODAY)
    assert start == datetime(2026, 8, 13, 10, 0, 0)
    assert end == datetime(2026, 8, 13, 11, 30, 0)


def test_time_interval_full_dates_pass_through():
    start, end = get_time_interval("2026-01-02 01:02:03", "2026-01-03 04:05:06")
    assert start == datetime(2026, 1, 2, 1, 2, 3)
    assert end == datetime(2026, 1, 3, 4, 5, 6)


def test_time_interval_one_sided_raises():
    with pytest.raises(ValueError, match="both"):
        get_time_interval(start="10:00:00")


def test_request_body_shape():
    start, end = datetime(2026, 8, 13, 5), datetime(2026, 8, 13, 12)
    body = json.loads(build_request_body(start, end, size=500, from_=1000, query="ks1"))
    must = body["query"]["bool"]["must"]
    assert must[0] == {"match_phrase": {"message": {"query": "Query too slow"}}}
    rng = must[1]["range"]["@timestamp"]
    assert rng["format"] == "epoch_second" and rng["gte"] < rng["lte"]
    assert must[2]["query_string"]["query"] == '"ks1"'
    assert body["size"] == 500 and body["from"] == 1000
    assert body["sort"][0]["@timestamp"]["order"] == "desc"


def test_header_shape():
    h = json.loads(build_request_header("my-index:log*"))
    assert h == {"index": "my-index:log*", "ignore_unavailable": True, "timeout": 30000}


def test_peek_total_hits():
    sample = '{"responses":[{"took":3,"hits":{"total":12345,"max_score":null}}]}'
    assert peek_total_hits(sample) == 12345
    with pytest.raises(ValueError, match="Unable"):
        peek_total_hits('{"no": "hits"}')
    with pytest.raises(ValueError, match="too high"):
        peek_total_hits('"hits":{"total":10000000,')


def test_plan_pages_ceil():
    assert plan_pages(0, 100) == 0
    assert plan_pages(1, 100) == 1
    assert plan_pages(100, 100) == 1
    assert plan_pages(101, 100) == 2


def test_plan_extraction_fanout():
    start, end = datetime(2026, 8, 13, 5), datetime(2026, 8, 13, 12)
    plan = plan_extraction("https://es/_msearch", "ix", start, end,
                           total_hits=25_000, size=10_000)
    assert [p.filename for p in plan] == ["08_13_0.json", "08_13_1.json", "08_13_2.json"]
    froms = [json.loads(p.ndjson.splitlines()[1])["from"] for p in plan]
    assert froms == [0, 10_000, 20_000]
    for p in plan:
        header = json.loads(p.ndjson.splitlines()[0])
        assert header["index"] == "ix"


def test_parse_curl_command():
    cmd = ("curl 'https://es.example.com/es/_msearch' -H 'Cookie: tok=abc' "
           "--data-binary $'{\"index\":\"es-index:log*\",\"ignore_unavailable\":true}'")
    url, index, cookie = parse_curl_command(cmd)
    assert url == "https://es.example.com/es/_msearch"
    assert index == "es-index:log*"
    assert cookie == "tok=abc"


def test_default_size_matches_reference_constant():
    assert DEFAULT_SIZE == 10_000
    assert page_filename(datetime(2026, 1, 5), 7) == "01_05_7.json"
