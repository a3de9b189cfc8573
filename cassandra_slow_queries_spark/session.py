"""SparkSession factory with scale-appropriate defaults.

The knobs here are the ones that matter both on ``local[32]`` (the test
environment) and on a large cluster reading ~100 TB:

- AQE on: runtime partition coalescing, skew-join splitting, and
  broadcast-join conversion replace hand-tuned partition counts.
- ``mapKeyDedupPolicy=LAST_WIN``: ``map_concat`` reproduces Python's
  ``dict.update`` semantics (reference: bound-value pattern overrides,
  analyze_slow_queries.py:645).
- Session timezone pinned to UTC so minute bucketing
  (``date_format(date_trunc(...))``) is deterministic across drivers.
- Arrow enabled for the (rare, extension-tier-only) pandas-UDF paths.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SHUFFLE_PARTITIONS = 32

# spread_input's size-floor fallback warning fires once per process (a
# module flag, not the warnings-module dedup: that keys on the message
# text, and a message embedding the exception re-fires per distinct
# exception — and per call under pytest's -W always).
_SIZE_FLOOR_WARNED = False


def scratch_dir(prefix: str) -> str:
    """``mkdtemp`` with process-exit cleanup registered.

    Staging inputs and streaming checkpoints need a fresh directory per
    use, but a long-lived process (bench loop, test session) invoking
    them repeatedly must not accumulate one copy per call — every
    scratch dir is removed at interpreter exit.
    """
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def spread_input(
    df: DataFrame, by: str | None = None, min_bytes: int = 0
) -> DataFrame:
    """Guard against unsplittable landing files serializing stage 1.

    A single-row-group Parquet file (or a gzip JSON log, or any fat
    unsplittable blob) yields ONE input split, so every per-row-heavy
    expression downstream — parse chains, shingle explodes, HOF folds —
    runs on one core no matter how many executors exist. The driver
    testdata is exactly this shape (one row group per table). When the
    scan has fewer splits than the session's shuffle parallelism, insert
    one cheap row-level exchange of the RAW rows (before any explode
    fan-out, so the shuffled volume is the small input, not the
    exploded one); otherwise no-op, so a real many-file corpus read at
    cluster scale pays nothing.

    The partition count is passed EXPLICITLY: AQE's partition coalescing
    would otherwise merge the small shuffle right back into one
    partition (explicit counts are exempt from coalescing). Deterministic
    filters still push through the exchange to the scan. Streaming
    frames are returned untouched (`.rdd` is undefined for them).

    ``min_bytes`` adds a SIZE floor under the split-count check: when the
    optimized plan's estimated input size is below it, return the frame
    unchanged even if the scan is narrow. Rationale (measured r12, the
    text-family A/B at sf0.1 vs sf1): on a tiny corpus the exchange +
    extra stage boundary cost MORE than the parallelism buys (0.6 MiB
    documents: 0.64 -> 1.06 s), while past a few MiB the same entries
    win 1.6-8x — the floor makes one call site correct at every tier
    instead of forcing a per-tier decision. If the stats are unavailable
    (e.g. a Connect frame without a local JVM handle), the floor is
    skipped and the split-count check alone decides — failing OPEN to
    spreading, since the guard exists for the large case.
    """
    if df.isStreaming:
        return df
    if min_bytes > 0:
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if size < min_bytes:
                return df
        except Exception as exc:
            # stats unavailable: fall through to the split check (fail
            # OPEN to spreading) — but say so ONCE, because if this
            # starts firing on classic frames (a py4j API change, a JVM
            # handle problem) every small-tier call site silently gains
            # the exchange the floor exists to avoid
            global _SIZE_FLOOR_WARNED
            if not _SIZE_FLOOR_WARNED:
                _SIZE_FLOOR_WARNED = True
                import warnings

                warnings.warn(
                    f"spread_input: size floor unavailable ({exc!r}); "
                    "falling back to the split-count check",
                    RuntimeWarning,
                    stacklevel=2,
                )
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= target:
        return df
    cols = [F.col(by)] if by is not None else []
    return df.repartition(target, *cols)


def release_entry_storage(spark: SparkSession) -> int:
    """Release every storage block the current session holds: SQL-cached
    frames (``DataFrame.persist``) via the catalog, then any remaining
    RDD-level persistent blocks (``localCheckpoint`` materializations,
    directly-persisted RDDs). Returns the number of RDD-level blocks
    released (the SQL cache clear is not counted — the catalog API does
    not report a count).

    Guide §5: "unpersist when done." The catalog's entries persist /
    localCheckpoint reused subframes INSIDE an entry build — correct
    within one entry, but a long-lived session running many entries
    (the bench loop: 150 entries × 3 passes) accumulates every entry's
    blocks until Python GC + ContextCleaner happen to release them.
    On an 8 GiB driver JVM that is nondeterministic storage pressure
    inside the very suite being measured: storage competes with
    execution memory, MEMORY_AND_DISK blocks spill to local disk, and
    later entries pay eviction + page-cache churn for earlier entries'
    leftovers. Harness loops call this BETWEEN entries (outside any
    timed region) so every entry starts from the same clean storage
    state; entries never share executor-block state across builds (all
    cross-entry reuse goes through parquet staging —
    plans/intermediates.py, catalog._stage_once), so the clear cannot
    change any result.
    """
    spark.catalog.clearCache()
    released = 0
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
            released += 1
    except Exception:
        # py4j surface moved — the SQL-cache clear above still covers
        # the persist() sites; do not let cleanup kill a bench pass
        pass
    return released


def get_spark(
    app_name: str = "cassandra-slow-queries-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[N]`` with N from ``SPARK_GRAFT_CPUS``
    (the driver's contract) or ``local[*]``; on a real cluster pass
    ``master=None`` with an externally configured session and this
    function only applies the SQL confs.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dynamic partition pruning OFF by default: the PartitionPruning
        # rule's alias-lineage substitution (findExpressionAndTrackLineage
        # Down + trimAliases) is re-run per join key per action and blows
        # up combinatorially on deep expression pipelines like the parse
        # chain — measured ~17 s of DRIVER time per action (independent of
        # row count; jstack-confirmed) on plans where DPP can never fire
        # anyway (computed string keys joined against broadcast dims, not
        # partition columns). Set SPARK_GRAFT_DPP=1 for jobs that join on
        # partition columns of a date-partitioned landing zone.
        .config(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled",
            "true" if os.environ.get("SPARK_GRAFT_DPP") == "1" else "false",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # r13 opt (guide §3.1): let AQE rewrite sort-merge joins to
        # shuffled-hash at runtime when EVERY post-shuffle partition of
        # the build side is under this threshold — the sort steps
        # disappear and the hash build is bounded by actual (not
        # estimated) partition sizes, so the OOM risk static
        # preferSortMergeJoin=false carries does not apply. Interleaved
        # paired A/B over the nine SMJ-bearing catalog entries at
        # sf0.1: 8/9 faster, total 17.95 -> 16.22 s. 64 MB is well
        # under per-task execution memory at 32 local cores / 8 GiB and
        # below the 256 MB advisory partition size a cluster would run;
        # large-scale joins whose partitions exceed it keep sort-merge.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64MB"),
        )
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default; read as long and convert at the scan
        # (plans/catalog.load truncates to micros, matching DuckDB)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
