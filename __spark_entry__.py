"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cassandra_slow_queries_spark/plans/catalog.py``
— one entry per operator from SURVEY.md §2 (and the extension tier),
each with a deterministic, cross-engine-safe oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_slow_queries_spark.plans.catalog import CATALOG  # noqa: E402


def _apply_session_confs(spark: SparkSession) -> None:
    """Confs the catalog depends on, for driver-created sessions."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # see session.py: DPP's lineage analysis costs ~17 s/action on deep
    # expression pipelines and can never fire on these plans
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    # r13 opt (guide §3.1): runtime SMJ→SHJ conversion for small
    # post-shuffle partitions (see session.py for the measured A/B)
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64MB"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1+F3+T1: top slow query shapes) on sf0.001."""
    _apply_session_confs(spark)
    return CATALOG["a1_top_queries"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_session_confs(spark)
            return CATALOG[name].spark(spark, sf_dir)

        return run

    return {name: wrap(name) for name in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (absent → rows-only check)."""
    return {name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None}
