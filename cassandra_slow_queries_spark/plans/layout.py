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

from contextlib import contextmanager
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


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Backfill/restatement write: dynamic partition overwrite replaces
    ONLY the hive partitions present in ``df`` and leaves every other
    partition's files physically untouched.

    This is how a 100 TB date-partitioned lake restates one bad day —
    recompute that day, overwrite its directory, never rewrite (or even
    list) the other 364. Static overwrite mode (the default) would
    truncate the whole root first; the per-write option scopes the
    behavior to this writer instead of mutating session conf.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


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


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column into one long, so rows close in EVERY dimension get close
    keys. Sorting/range-partitioning files by this key bounds each
    file's min/max range on all dimensions at once — parquet row-group
    and file skipping then works for predicates on any of them, where a
    linear sort only serves its leading column. (Single-dimension
    directory pruning is :func:`write_partitioned`; z-order is the
    multi-dimension analogue for high-cardinality numeric columns.)

    Inputs must already be non-negative integers < 2**bits (rank or
    scale them first — the caller owns normalization, which keeps this
    a pure expression). Pure bitwise expressions, JVM codegen, no UDF:
    ``bits × len(cols)`` shift/or terms.
    """
    from pyspark.sql import functions as F

    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(exprs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(exprs) + i))
    return z


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The exact SQL-expression twin of :func:`zorder_key` (same term
    order), so a DuckDB oracle reproduces identical keys."""
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            shift = b * len(cols) + i
            terms.append(f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {shift})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zcol,
    num_files: int,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` clustered by a pre-computed z-key column: range
    exchange on the key (``num_files`` ordered chunks — sampled bounds,
    fine for layout; the deterministic-cell analysis in the catalog
    gate uses fixed-width cells instead) + in-partition sort, so each
    output file covers one tight z-range → one tight bounding box over
    the interleaved dimensions."""
    from pyspark.sql import functions as F

    zc = F.col(zcol) if isinstance(zcol, str) else zcol
    w = (
        df.repartitionByRange(num_files, zc)
        .sortWithinPartitions(zc)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    rows_per_file: int,
) -> int:
    """Rewrite a parquet directory into ``ceil(rows / rows_per_file)``
    evenly-sized files (round-robin repartition — no key, no skew) and
    return the file count written.

    The small-files remedy: a streaming sink or over-parallel job that
    leaves thousands of KB-sized files per partition makes every later
    scan pay per-file open/footer/listing costs — at 100 TB the listing
    alone can dominate. Compaction is the standing maintenance operator
    that restores ≈target-sized files; derive ``rows_per_file`` from a
    byte target with :func:`rows_for_target_bytes`.
    """
    import math

    df = spark.read.parquet(src_dir)
    total = df.count()
    n = max(1, math.ceil(total / rows_per_file))
    df.repartition(n).write.mode("overwrite").parquet(dst_dir)
    return len(
        [f for f in spark.read.parquet(dst_dir).inputFiles()]
    )


def rows_for_target_bytes(
    spark: SparkSession, src_dir: str, target_bytes: int
) -> int:
    """Rows per file that lands ≈``target_bytes`` per output file, from
    the source's measured on-disk bytes/row (compressed parquet
    in/out ≈ same density). Driver-side file metadata only."""
    import os
    from urllib.parse import urlparse

    df = spark.read.parquet(src_dir)
    total_rows = df.count()
    if total_rows == 0:
        return 1
    total_bytes = sum(
        os.path.getsize(urlparse(f).path) for f in df.inputFiles()
    )
    bytes_per_row = max(1.0, total_bytes / total_rows)
    return max(1, int(target_bytes / bytes_per_row))


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


def pushed_aggregation(df: DataFrame) -> str:
    """The ``PushedAggregation: [...]`` payload of the plan's parquet
    scan, or ``''`` when nothing was pushed.

    Aggregate pushdown (COUNT/MIN/MAX answered from parquet footer
    statistics without scanning a single row group — the difference
    between touching ~KB of metadata and ~TB of data on a fact-table
    probe) is a DataSource-v2-only planning decision, so it is visible
    in the pre-execution plan exactly like :func:`exchange_count`'s
    Exchange elision. Requires ``spark.sql.parquet.aggregatePushdown``
    AND parquet removed from ``spark.sql.sources.useV1SourceList``;
    the catalog gate flips both for its own scan and restores them.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        idx = line.find("PushedAggregation: [")
        if idx >= 0:
            payload = line[idx + len("PushedAggregation: ["):]
            return payload.split("]", 1)[0]
    return ""


# Confs under which Catalyst injects a RUNTIME BLOOM FILTER into a
# shuffle join: the selective (filtered) side's join keys are collapsed
# into a bloom filter by a subquery, and the big side's SCAN gains a
# ``might_contain`` probe — rows that cannot match are dropped before
# they are shuffled. At 100 TB this is the difference between shuffling
# the whole fact table to discover 1% of it joins, and shuffling ~1%
# (plus the filter's false positives). Production defaults only fire
# when the application side is big (scan ≥ 10GB) and the creation side
# cheap (≤ 10MB) — sizes a local test never reaches, so the gate floors
# the application threshold instead of pretending a test table is 10GB,
# and raises the creation ceiling so a filtered test dim qualifies.
# Broadcast joins don't inject (the big side never shuffles), hence the
# autoBroadcastJoinThreshold=-1 pin for the demonstration join.
RUNTIME_BLOOM_CONFS: dict[str, str] = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def conf_scope(spark: SparkSession, confs: dict[str, str]):
    """Set session confs for a scope, restoring (or unsetting) each on
    exit — the guard pattern the aggregate-pushdown catalog gate uses,
    lifted into a reusable seam. Planning-time decisions (runtime
    filters, v2 pushdown) must hold while the JOB runs, so materialize
    results inside the scope."""
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, p in prev.items():
            if p is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, p)


def might_contain_count(df: DataFrame) -> int:
    """Number of ``might_contain`` (runtime bloom filter) probes in the
    physical plan — 0 when no runtime filter was injected. Like
    :func:`exchange_count`, a planning-time fact: assert it as a
    regression gate, not a hope."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("might_contain(")
