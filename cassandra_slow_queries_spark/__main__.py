"""CLI entry points mirroring the reference's three-command workflow.

- ``analyze``       ← analyze_slow_queries.py:1309-1335 (files + config
  → five CSV reports + incident summary)
- ``plan-download`` ← download_slow_queries.py:340-362 (ES ``_msearch``
  page fan-out; THIS environment has no network, so the command emits
  the page-request manifest — the idempotent fetch units — instead of
  executing HTTP; a runner executes them wherever curl works)
- ``find-pk-nodes`` ← find_pk_nodes.py:120-128 (slow-PK CSV → owning
  nodes via the endpoint provider seam, CSV on stdout)

Run as ``python -m cassandra_slow_queries_spark <command> ...``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_config(args: argparse.Namespace):
    from cassandra_slow_queries_spark.config import AnalysisConfig
    from cassandra_slow_queries_spark.sources.configs import (
        load_query_patterns,
        load_tag_map,
    )
    from cassandra_slow_queries_spark.sources.cql_schema import parse_cql_schema
    from pathlib import Path

    schema = {}
    if args.schema:
        schema = parse_cql_schema(Path(args.schema).read_text())
    queries = load_query_patterns(args.queries) if args.queries else []
    tags = load_tag_map(args.tags) if args.tags else {}
    return AnalysisConfig(
        top_n=args.top_n,
        rows_per_minute=args.rows_per_minute,
        order_by=args.order_by,
        min_count=args.min_count,
        schema=schema,
        queries=queries,
        tags=tags,
        ignored_column_families=tuple(getattr(args, "ignore_cf", ()) or ()),
        report_timezone=getattr(args, "report_tz", None),
    )


def cmd_analyze(args: argparse.Namespace) -> int:
    """files → parse → enrich → five CSV reports (reference ``run``,
    analyze_slow_queries.py:1107-1146) + the incident-logger summary on
    stderr (:209-292 analog via observe())."""
    from cassandra_slow_queries_spark.operators.aggregates import (
        five_reports_shared_shuffle,
    )
    from cassandra_slow_queries_spark.plans.pipeline import (
        incident_report,
        parse_messages,
        parse_observation,
    )
    from cassandra_slow_queries_spark.plans.reports import write_reports
    from cassandra_slow_queries_spark.session import get_spark
    from cassandra_slow_queries_spark.sources.kibana import (
        read_kibana_json,
        shard_failure_report,
    )
    from pyspark.storagelevel import StorageLevel

    spark = get_spark("cassandra-slow-queries-analyze")
    spark.sparkContext.setLogLevel("DEBUG" if args.verbose else "ERROR")
    cfg = _build_config(args)
    raw = read_kibana_json(spark, args.file)
    obs = parse_observation()
    fact = parse_messages(
        raw, spark, cfg, observation=obs, with_incidents=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    reports = five_reports_shared_shuffle(fact.drop("_incidents"), cfg)
    run_dir = write_reports(reports, args.out, run_tag=args.run_tag)
    # shard-failure accounting (download_slow_queries.py:110-128 analog):
    # a failed shard means that page's hits are silently incomplete
    for row in shard_failure_report(spark, args.file).collect():
        reasons = "; ".join(r for r in row.reasons if r)[:500]
        print(
            f"WARNING: {row.file}: {row.n_failed_shards} failed shard(s)"
            + (f": {reasons}" if reasons else ""),
            file=sys.stderr,
        )
    # incident flush, ascending by count (reference T4, :255-261)
    for row in incident_report(fact).collect():
        print(f"incidents: {row['count']}x {row.incident}", file=sys.stderr)
    m = obs.get
    print(
        "parsed {n_parsed}/{n_input} rows "
        "(bad ts: {n_bad_ts}, bad grammar: {n_bad_grammar}, "
        "unknown statement: {n_unknown_statement})".format(**m),
        file=sys.stderr,
    )
    print(f"reports written to {run_dir}", file=sys.stderr)
    return 0


def cmd_plan_download(args: argparse.Namespace) -> int:
    """ES extraction plan: the ``_msearch`` page fan-out as a JSON
    manifest of idempotent page requests (download_slow_queries.py:
    340-362; page math :120-180). ``--total-hits`` can be given directly
    or peeked from a saved page-0 response (``--sample``, the
    hits.total path with the 10M cap, :95-108)."""
    from cassandra_slow_queries_spark.sources.es_extract import (
        get_time_interval,
        parse_curl_command,
        peek_total_hits,
        plan_extraction,
    )
    from pathlib import Path

    if args.from_curl:
        url, index, cookie = parse_curl_command(Path(args.from_curl).read_text())
    else:
        url, index = args.url, args.index
        cookie = Path(args.cookie).read_text().strip(" \n") if args.cookie else ""
    if not url or not index:
        print("need --url and --index (or --from-curl)", file=sys.stderr)
        return 2
    start, end = get_time_interval(args.start, args.end)
    if args.sample:
        total = peek_total_hits(Path(args.sample).read_text())
    elif args.total_hits is not None:
        total = args.total_hits
    else:
        print(
            "no network in this environment: pass --total-hits N or "
            "--sample page0.json (a saved first-page response)",
            file=sys.stderr,
        )
        return 2
    pages = plan_extraction(
        url, index, start, end, total, size=args.size, query=args.query
    )
    manifest = {
        "url": url,
        "index": index,
        "cookie_present": bool(cookie),
        "start": start.isoformat(),
        "end": end.isoformat(),
        "total_hits": total,
        "pages": [
            {"url": p.url, "filename": p.filename, "ndjson": p.ndjson}
            for p in pages
        ],
    }
    out = Path(args.out)
    out.write_text(json.dumps(manifest, indent=2))
    print(f"{len(pages)} page request(s) planned → {out}", file=sys.stderr)
    return 0


def cmd_find_pk_nodes(args: argparse.Namespace) -> int:
    """Slow-PK CSV → owning nodes, CSV on stdout (find_pk_nodes.py:
    96-117 prints comma-joined rows; the Endpoint0..N header shape is
    FIXTURES.md A7/K3)."""
    from cassandra_slow_queries_spark.operators.endpoints import (
        attach_endpoints,
        endpoints_report,
    )
    from cassandra_slow_queries_spark.session import get_spark
    from cassandra_slow_queries_spark.sources.csv_keys import read_slow_keys_csv

    spark = get_spark("cassandra-slow-queries-find-pk-nodes")
    spark.sparkContext.setLogLevel("DEBUG" if args.verbose else "ERROR")
    keys = read_slow_keys_csv(spark, args.csv)
    enriched = attach_endpoints(
        keys, provider=args.provider, n_nodes=args.n_nodes, rf=args.rf
    )
    report = endpoints_report(enriched, max_endpoints=args.max_endpoints)
    for src, header in [
        ("keyspace", "Keyspace"),
        ("column_family", "Column Family"),
        ("primary_key", "Primary Key"),
    ]:
        report = report.withColumnRenamed(src, header)
    cols = report.columns
    print(",".join(cols))
    for row in report.collect():
        print(",".join("" if row[c] is None else str(row[c]) for c in cols))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="python -m cassandra_slow_queries_spark",
        description="Cassandra slow query log analytics on PySpark",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    # analyze — argparse surface pinned to analyze_slow_queries.py:1309-1321
    a = sub.add_parser("analyze", help="Kibana JSON files → five CSV reports")
    a.add_argument("file", nargs="+", help="Kibana search JSON files")
    a.add_argument("--schema", help="CQL schema file")
    a.add_argument("--queries", help="Additional query patterns (JSON)")
    a.add_argument("--tags", help="Tag: keyspace mappings (JSON)")
    a.add_argument("--top-n", type=int, default=100, help="Limit to top N rows")
    a.add_argument(
        "--rows-per-minute", type=int, default=5, help="Number of rows per minute"
    )
    a.add_argument(
        "--min-count", type=int, default=5, help="Minimum number of occurrences"
    )
    a.add_argument(
        "--order-by",
        default="duration",
        choices=["duration", "avg_duration", "count"],
        help="Order results by",
    )
    a.add_argument("--out", default="reports", help="Output directory")
    a.add_argument(
        "--run-tag",
        dest="run_tag",
        metavar="TAG",
        help="Per-run folder name under --out (default: current "
        "date/time as YYYY-MM-DD_HHMM — reference TODO "
        "analyze_slow_queries.py:62-63)",
    )
    a.add_argument(
        "--report-tz",
        metavar="ZONE",
        help="Render report time buckets in this IANA zone (reference "
        "TODO analyze_slow_queries.py:58); default UTC",
    )
    a.add_argument(
        "--ignore-cf",
        action="append",
        default=[],
        metavar="CF",
        help="Column family to exclude from analysis ('cf' or 'ks.cf'; "
        "repeatable — reference TODO analyze_slow_queries.py:61)",
    )
    a.add_argument(
        "-v", dest="verbose", action="store_true", default=False,
        help="Verbose output",
    )
    a.set_defaults(fn=cmd_analyze)

    # plan-download — surface pinned to download_slow_queries.py:340-352
    d = sub.add_parser(
        "plan-download", help="plan the ES slow-query extraction pages"
    )
    d.add_argument("--url", help="Elasticsearch URL")
    d.add_argument("--index", help="Elasticsearch index name")
    d.add_argument("--cookie", help="Cookie file")
    d.add_argument("--from-curl", help="Parse parameters from curl command file")
    d.add_argument("--start", help="Start time")
    d.add_argument("--end", help="End time")
    d.add_argument("--query", help="Additional query string")
    d.add_argument("--size", type=int, default=10000, help="Request size")
    d.add_argument("--total-hits", type=int, help="Known total hit count")
    d.add_argument("--sample", help="Saved page-0 response JSON (peeks total)")
    d.add_argument("--out", default="download_plan.json", help="Manifest path")
    d.add_argument(
        "-v", dest="verbose", action="store_true", default=False,
        help="Verbose output",
    )
    d.set_defaults(fn=cmd_plan_download)

    # find-pk-nodes — surface pinned to find_pk_nodes.py:120-128
    f = sub.add_parser(
        "find-pk-nodes", help="find nodes that own slow primary keys"
    )
    f.add_argument("csv", help="Slow primary key CSV")
    f.add_argument(
        "--provider",
        default="fake",
        choices=["fake", "nodetool"],
        help="endpoint provider (nodetool needs a live Cassandra)",
    )
    f.add_argument("--n-nodes", type=int, default=6, help="fake ring size")
    f.add_argument("--rf", type=int, default=3, help="fake replication factor")
    f.add_argument(
        "--max-endpoints", type=int, default=6, help="Endpoint columns in output"
    )
    f.add_argument(
        "-v", dest="verbose", action="store_true", default=False,
        help="Verbose output",
    )
    f.set_defaults(fn=cmd_find_pk_nodes)
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
