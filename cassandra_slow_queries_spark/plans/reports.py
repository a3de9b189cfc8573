"""Report sinks (SURVEY.md K1-K3): the five CSVs with reference headers.

Header names and column orders are pinned to the reference writers
(analyze_slow_queries.py:1148-1246; FIXTURES.md A7). ``single_file=True``
coalesces to one partition for byte-level parity with the reference's
single-file CSVs — on a cluster leave it False and let each report write
partitioned output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# report name → list of (output header, fact column)
REPORT_COLUMNS: dict[str, list[tuple[str, str]]] = {
    "query": [
        ("Count", "count"),
        ("Duration", "duration"),
        ("Avg. Duration", "avg_duration"),
        ("Query", "query"),
    ],
    "query_pk": [
        ("Count", "count"),
        ("Duration", "duration"),
        ("Avg. Duration", "avg_duration"),
        ("Primary Key", "primary_key"),
        ("Query", "query"),
    ],
    "primary_key": [
        ("Count", "count"),
        ("Duration", "duration"),
        ("Avg. Duration", "avg_duration"),
        ("Keyspace", "keyspace"),
        ("Column Family", "column_family"),
        ("Primary Key", "primary_key"),
    ],
    "volume": [
        ("Time", "minute"),
        ("Count", "count"),
        ("Duration", "duration"),
        ("Avg. Duration", "avg_duration"),
    ],
    "volume_top": [
        ("Time", "minute"),
        ("Count", "count"),
        ("Duration", "duration"),
        ("Avg. Duration", "avg_duration"),
        ("Primary Key", "primary_key"),
        ("Query", "query"),
    ],
}

REPORT_FILES = {
    "query": "slow_queries",
    "query_pk": "slow_primary_keys",
    "primary_key": "primary_keys",
    "volume": "volume",
    "volume_top": "volume_top_n",
}


def shape_report(df: DataFrame, report: str) -> DataFrame:
    """Project + rename a report frame to its CSV column contract."""
    cols = REPORT_COLUMNS[report]
    return df.select(*[F.col(src).alias(header) for header, src in cols])


def run_folder_name(when: "datetime | None" = None) -> str:
    """Per-run report folder name, ``YYYY-MM-DD_HHMMSS.ffffff``
    (reference TODO analyze_slow_queries.py:62-63: "Output all reports
    into a folder. Name with date/time"). Second + microsecond precision
    is the collision guard: ``write_reports`` uses ``mode("overwrite")``
    per report, so two untagged runs sharing a folder name would clobber
    each other — at minute granularity that is one impatient re-run
    away. ``when`` is injectable for tests."""
    from datetime import datetime

    return (when or datetime.now()).strftime("%Y-%m-%d_%H%M%S.%f")


def write_reports(
    reports: dict[str, DataFrame],
    out_dir: str,
    single_file: bool = True,
    run_tag: str | None = None,
) -> str:
    """Write each report as CSV with header (reference K1) into a
    per-run folder ``out_dir/<run_tag>/<report>`` and return that
    folder's path.

    ``run_tag`` defaults to the date/time name of :func:`run_folder_name`
    (reference TODO :63) — pass an explicit tag for deterministic
    layouts (CI, reproducible pipelines); successive runs never
    overwrite each other unless they share a tag.
    """
    run_dir = f"{out_dir}/{run_tag or run_folder_name()}"
    for name, df in reports.items():
        shaped = shape_report(df, name)
        if single_file:
            shaped = shaped.coalesce(1)
        shaped.write.mode("overwrite").option("header", "true").csv(
            f"{run_dir}/{REPORT_FILES[name]}"
        )
    return run_dir
