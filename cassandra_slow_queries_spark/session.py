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

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


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
