"""r14 storage-release discipline (guide §5: unpersist when done).

Catalog entries persist / localCheckpoint reused subframes inside their
builds; a long-lived harness session (bench loop, oracle sweep) must be
able to release ALL of it between entries so storage state never leaks
across builds. These tests pin the done-criterion from the r13 verdict:
no unreleased storage after an entry's noop write + release.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cassandra_slow_queries_spark.session import release_entry_storage

SF_DIR = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _n_stored(spark) -> int:
    """Blocks actually materialized in the block manager (persistent
    RDD registrations can exist without materialized blocks; storage
    info is the ground truth for 'memory is being held')."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _run_entry(spark, name: str) -> None:
    from cassandra_slow_queries_spark.plans.catalog import CATALOG

    CATALOG[name].spark(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()


def test_persist_entry_releases_clean(spark):
    """x_mg_topk persists two frames per build; after the noop write the
    blocks exist, after release they are gone."""
    release_entry_storage(spark)  # start clean whatever ran before
    _run_entry(spark, "x_mg_topk")
    assert _n_persistent(spark) > 0  # the probe sees the entry's blocks
    release_entry_storage(spark)
    assert _n_persistent(spark) == 0
    assert _n_stored(spark) == 0


def test_localcheckpoint_entry_releases_clean(spark):
    """x_pagerank localCheckpoints loop frames — RDD-level blocks the
    SQL cache clear alone would miss."""
    release_entry_storage(spark)
    _run_entry(spark, "x_pagerank")
    assert _n_persistent(spark) > 0
    release_entry_storage(spark)
    assert _n_persistent(spark) == 0
    assert _n_stored(spark) == 0


def test_released_entry_still_recomputable(spark):
    """Releasing after an action must not poison a rebuild: a fresh
    build of the same entry still runs (each build creates fresh
    frames; nothing cross-entry lives in executor blocks)."""
    release_entry_storage(spark)
    _run_entry(spark, "x_bm25")
    release_entry_storage(spark)
    _run_entry(spark, "x_bm25")  # rebuild from scratch, must not raise
    release_entry_storage(spark)
    assert _n_stored(spark) == 0
