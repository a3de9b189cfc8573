"""Bucketed table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a repeated fact⋈fact join (orders ⋈
lineitem every analysis run) is not the join — it is re-shuffling both
sides on the join key every single run. The warehouse fix is to pay the
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows
into a fixed number of per-key files, and every later join/aggregation
on that key reads the buckets co-located — Spark's planner drops the
Exchange on each bucketed side entirely (``spark.sql.sources.bucketing``,
on by default). ``sortBy`` additionally pre-sorts within buckets so the
sort-merge join can skip its sort.

This module is the thin, explicit seam for that layout decision:

- :func:`write_bucketed` — bucketed parquet ``saveAsTable`` (bucket
  metadata lives in the session catalog; plain parquet readers see
  normal files).
- :func:`bucketed_table` — create-once-per-session helper, the
  ``_stage_once`` pattern for catalog-backed tables.
- :func:`exchange_count` — plan inspector counting Exchange operators,
  the test hook that pins "this join did not shuffle" as a regression
  check instead of a hope.

Reference scope note: the reference pipeline (analyze_slow_queries.py)
is single-process and re-reads ``processed.json`` per run — bucketing is
the scale-out analogue of its "materialize once, re-analyze many times"
TODO (analyze_slow_queries.py:62).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from cassandra_slow_queries_spark.session import scratch_dir


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table registered as ``table``.

    ``num_buckets`` should be sized so one bucket ≈ one comfortable task
    (rows/bucket × row width ≲ a few hundred MB at target scale) and
    MUST match between tables meant to join shuffle-free — Spark only
    elides the Exchange when both sides hash into the same bucket count
    on the join keys. ``path`` pins the files to an explicit location
    (otherwise the session warehouse dir); bucket metadata lives in the
    catalog either way.
    """
    w = df.write.format("parquet").mode("overwrite")
    w = w.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(
    spark: SparkSession,
    table: str,
    build: Callable[[], DataFrame],
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Return ``spark.table(table)``, creating it bucketed on first use.

    The create-once seam for session-lived bucketed layouts (tests and
    the catalog entry): ``build()`` runs only when the table does not
    exist yet, writing into a scratch path cleaned at process exit. A
    production deployment would point :func:`write_bucketed` at durable
    storage instead and keep the table across runs — that persistence is
    exactly the point of paying the write-time shuffle.
    """
    if not spark.catalog.tableExists(table):
        write_bucketed(
            build(),
            table,
            bucket_cols,
            num_buckets,
            sort_cols,
            path=scratch_dir(f"bucketed_{table}_"),
        )
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as hive-layout partitioned parquet
    (``path/col=value/…``) — the directory-level data-skipping layout.

    Bucketing (above) optimizes *joins* on a high-cardinality key;
    partitioning optimizes *scans* on a low-cardinality predicate
    column (date, event type, tenant): a filter on a partition column
    prunes whole directories at planning time, so a day-filtered query
    over a year of 100 TB logs reads ~1/365th of the files. Keep
    partition columns low-cardinality — a high-cardinality partition
    column creates millions of tiny files and kills the listing step
    (that is what bucketing is for).
    """
    w = df.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*partition_cols).parquet(path)


def scan_partition_filters(df: DataFrame) -> str:
    """The ``PartitionFilters: [...]`` clause of the plan's file scan
    (empty string when none) — the test hook pinning that a predicate
    actually prunes directories instead of being applied post-scan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters:" in line:
            start = line.index("PartitionFilters:") + len("PartitionFilters:")
            # the clause ends at the matching close bracket
            rest = line[start:].strip()
            depth = 0
            for i, ch in enumerate(rest):
                if ch == "[":
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        return rest[: i + 1]
            return rest
    return ""


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-exchange) operators in the
    physical plan — 0 on a fully co-located plan.

    Inspects the pre-execution plan (inside AdaptiveSparkPlan when AQE
    is on): bucketing-based Exchange elision is a planning-time
    decision, so it is visible before any job runs. Counts
    ``ShuffleExchange``/``BroadcastExchange`` node headers, not the word
    "Exchange" anywhere (reuse markers mention it too).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.lstrip("+-*: (0123456789)").startswith(
            ("Exchange", "ShuffleExchange", "BroadcastExchange")
        )
        for line in plan.splitlines()
    )
