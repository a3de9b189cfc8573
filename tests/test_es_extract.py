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


def test_es_reader_options_pushdown():
    """The connector option map carries the same S2 predicate as the
    landing-zone path, plus node/port/ssl parsed from the url."""
    from cassandra_slow_queries_spark.sources.es_extract import es_reader_options

    start, end = datetime(2026, 8, 13, 5), datetime(2026, 8, 13, 12)
    opts = es_reader_options(
        "https://kibana.example.com:9243/elasticsearch/_msearch",
        "logstash-*",
        start,
        end,
        query="ks1",
        cookie="session=abc",
    )
    assert opts["es.nodes"] == "kibana.example.com"
    assert opts["es.port"] == "9243"
    assert opts["es.resource"] == "logstash-*"
    assert opts["es.net.ssl"] == "true"
    assert opts["es.net.http.header.Cookie"] == "session=abc"
    q = json.loads(opts["es.query"])["query"]["bool"]["must"]
    assert q[0] == {"match_phrase": {"message": {"query": "Query too slow"}}}
    assert q[1]["range"]["@timestamp"]["format"] == "epoch_second"
    assert q[2]["query_string"]["query"] == '"ks1"'
    # pagination keys must NOT leak in: the connector scrolls per shard
    assert not any("size" in k or "from" in k for k in opts)
    # defaults: port 9200, no ssl, no cookie header
    bare = es_reader_options("http://es-host/_msearch", "ix", start, end)
    assert bare["es.port"] == "9200" and bare["es.net.ssl"] == "false"
    assert "es.net.http.header.Cookie" not in bare


def test_read_es_clear_error_without_connector(spark):
    """Without the elasticsearch-hadoop jar, read_es fails at plan time
    with the spark.jars.packages instruction, not a bare
    ClassNotFoundException."""
    from cassandra_slow_queries_spark.sources.es_extract import read_es

    start, end = datetime(2026, 8, 13, 5), datetime(2026, 8, 13, 12)
    with pytest.raises(Exception, match="elasticsearch|jars.packages"):
        read_es(spark, "http://localhost:9200", "ix", start, end)


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


def test_es_extraction_runner_end_to_end(spark, tmp_path):
    """The full reference extraction workflow against a loopback HTTP
    stub (download_slow_queries.py:44-68 pagination): probe page 0 →
    peek hits.total → plan the page fan-out → fetch every page to the
    landing zone → read_kibana_json parses the downloaded files into
    the raw log frame."""
    import http.server
    import threading

    from cassandra_slow_queries_spark.sources.es_extract import fetch_pages
    from cassandra_slow_queries_spark.sources.kibana import read_kibana_json

    N, SIZE = 15, 10

    def make_hit(i: int) -> dict:
        return {
            "_source": {
                "@timestamp": f"2026-08-13T10:{i:02d}:00.000000Z",
                "message": (
                    f"INFO Query too slow, took {100 + i} ms: "
                    "[1 bound values] SELECT * FROM ks1.events "
                    f"WHERE a=? LIMIT 10; [a:'v{i}']"
                ),
                "tags": ["prod"],
            }
        }

    class Handler(http.server.BaseHTTPRequestHandler):
        cookies_seen: list[str | None] = []

        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            type(self).cookies_seen.append(self.headers.get("Cookie"))
            req = json.loads(body.decode().splitlines()[1])
            hits = [make_hit(i) for i in range(N)][
                req["from"] : req["from"] + req["size"]
            ]
            # compact separators like real ES output — the hits.total
            # peek relies on the marker having no spaces
            payload = json.dumps(
                {"responses": [{"hits": {"total": N, "hits": hits}}]},
                separators=(",", ":"),
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # quiet test output
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/elasticsearch/_msearch"
        start, end = get_time_interval("2026-08-13 05:00", "2026-08-13 12:00")
        # page-0 probe: fetch one page, peek hits.total from the first
        # chunk (the reference's 1000-char peek, :84-107)
        probe = plan_extraction(url, "ix", start, end, total_hits=1, size=SIZE)
        [page0] = fetch_pages(probe, str(tmp_path / "probe"), cookie="tok=abc")
        total = peek_total_hits(open(page0).read(1000))
        assert total == N
        assert plan_pages(total, SIZE) == 2  # ceil(15/10)
        # full fan-out → landing zone
        pages = plan_extraction(url, "ix", start, end, total, size=SIZE)
        assert [p.filename for p in pages] == ["08_13_0.json", "08_13_1.json"]
        files = fetch_pages(pages, str(tmp_path / "landing"), cookie="tok=abc")
        assert all(Handler.cookies_seen) and len(Handler.cookies_seen) == 3
        # the landing zone parses through the production reader
        raw = read_kibana_json(spark, files)
        assert raw.count() == N
        msgs = {r.message for r in raw.select("message").collect()}
        assert any("took 100 ms" in m for m in msgs)
    finally:
        srv.shutdown()


def test_fetch_pages_retries_transient_failures(tmp_path):
    """A page whose first attempt returns 500 succeeds on retry; a page
    that keeps failing raises after exhausting retries (a silently
    missing page would be silently missing data)."""
    import http.server
    import threading
    import urllib.error

    from cassandra_slow_queries_spark.sources.es_extract import fetch_pages

    attempts: dict[str, int] = {}

    class Flaky(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            frm = json.loads(body.decode().splitlines()[1])["from"]
            attempts[frm] = attempts.get(frm, 0) + 1
            # page 0: fail the first attempt only; page 10: always fail
            # with a 500; page 20: always fail with a 403 (non-transient)
            if (frm == 0 and attempts[frm] == 1) or frm == 10:
                self.send_response(500)
                self.end_headers()
                return
            if frm == 20:
                self.send_response(403)
                self.end_headers()
                return
            payload = b'{"responses":[]}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Flaky)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/_msearch"
        start = datetime(2026, 8, 13, 5)
        end = datetime(2026, 8, 13, 12)
        ok_page = plan_extraction(url, "ix", start, end, total_hits=1, size=10)
        [f] = fetch_pages(ok_page, str(tmp_path / "a"), backoff=0.0)
        assert attempts[0] == 2  # failed once, retried, succeeded
        assert open(f).read() == '{"responses":[]}'

        bad = plan_extraction(url, "ix", start, end, total_hits=20, size=10)[1:]
        with pytest.raises(urllib.error.HTTPError):
            fetch_pages(bad, str(tmp_path / "b"), retries=2, backoff=0.0)
        assert attempts[10] == 3  # initial + 2 retries, then raised

        # 4xx is non-transient (expired cookie, bad request): fail fast,
        # no doomed re-POSTs with backoff
        auth = plan_extraction(url, "ix", start, end, total_hits=30, size=10)[2:]
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            fetch_pages(auth, str(tmp_path / "c"), retries=2, backoff=0.0)
        assert exc_info.value.code == 403
        assert attempts[20] == 1  # single attempt, no retries
    finally:
        srv.shutdown()


def test_fetch_pages_distributed_multi_task(spark, tmp_path):
    """The scale path for S1 ingest (round-8 verdict item 3): the page
    fan-out dispatched as Spark tasks via mapInPandas. Pins (a) every
    page fetched, by MORE than one task; (b) the files are
    byte-identical to the driver-side loop's output; (c) per-page retry
    (5xx then success) still happens inside the task; (d) a page that
    keeps failing fails the whole JOB, not silently."""
    import http.server
    import threading
    from collections import Counter

    from cassandra_slow_queries_spark.sources.es_extract import (
        fetch_pages,
        fetch_pages_distributed,
    )

    attempts: Counter = Counter()
    fail_always: set[int] = set()
    fail_once: set[int] = set()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            frm = json.loads(body.decode().splitlines()[1])["from"]
            attempts[frm] += 1
            if frm in fail_always or (frm in fail_once and attempts[frm] == 1):
                self.send_response(500)
                self.end_headers()
                return
            payload = json.dumps({"responses": [{"page_from": frm}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/_msearch"
        start = datetime(2026, 8, 13, 5)
        end = datetime(2026, 8, 13, 12)
        pages = plan_extraction(url, "ix", start, end, total_hits=80, size=10)
        assert len(pages) == 8

        fail_once.add(30)  # page 3: one 500, then success (in-task retry)
        paths, n_tasks = fetch_pages_distributed(
            spark, pages, str(tmp_path / "dist"), backoff=0.0, num_tasks=4
        )
        assert n_tasks > 1, "fan-out ran on a single task"
        assert [p.rsplit("/", 1)[1] for p in paths] == [p.filename for p in pages]
        assert attempts[30] == 2  # retried inside the task
        # byte-parity with the driver-side loop
        serial = fetch_pages(pages, str(tmp_path / "serial"), backoff=0.0)
        for d, s in zip(paths, serial):
            assert open(d).read() == open(s).read()

        # a permanently failing page fails the JOB
        fail_always.add(50)
        with pytest.raises(Exception):
            fetch_pages_distributed(
                spark, pages, str(tmp_path / "dist2"), retries=1, backoff=0.0
            )
    finally:
        srv.shutdown()


def test_fetch_pages_distributed_empty_plan(spark, tmp_path):
    from cassandra_slow_queries_spark.sources.es_extract import (
        fetch_pages_distributed,
    )

    paths, n_tasks = fetch_pages_distributed(spark, [], str(tmp_path / "d"))
    assert paths == [] and n_tasks == 0
