"""Session-scoped shared intermediates: materialize once, reuse across plans.

The dedup family all derives from the same expensive corpus pass — the
3-gram distinct-shingle explode and the exact Jaccard pairs built from
it. Running each catalog entry standalone would repeat that pass four
times (exact pairs, cluster edges, MinHash verification, SimHash ground
truth). A real large-scale pipeline does what a warehouse does instead:
materialize the shared intermediate ONCE and join everything downstream
against it — at 100 TB the difference is three fewer full-corpus
explodes per analysis run.

This registry is the smallest thing that expresses that: a per-session
(Spark ``applicationId``-keyed) map of persisted DataFrames. Entries are
built lazily on first use, eagerly materialized by the builder (builders
return frames that are already persisted + counted, the
``_materialize_release`` contract in ``operators/dedup.py``), and live
until :func:`evict_shared` — pair-frames are candidate-sized (orders of
magnitude smaller than the corpus), so the storage footprint is
negligible next to the shuffle they save.

Keying by ``applicationId`` makes staleness impossible across session
restarts; entries from dead sessions are pruned on access.

DataFrame entries are held as RELIABLE parquet materializations (written
once to a session temp dir, read back), not as cached/locally-checkpointed
executor blocks: a session-long intermediate backed only by
executor-local storage becomes permanently unrecoverable the moment an
executor is lost or dynamic allocation decommissions it (localCheckpoint
truncates the lineage that would have allowed recomputation). On a real
cluster the temp dir would sit on the shared FS (HDFS/S3 —
``spark.local.dir`` / checkpoint-dir config); the re-read frame's lineage
is just "scan parquet", recomputable from any executor. The frames are
candidate-pair / index sized — orders of magnitude smaller than the
corpus — so the write is negligible next to the corpus pass it saves.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, object] = {}
_DIRS: dict[tuple, str] = {}


@atexit.register
def _drop_all_dirs() -> None:
    """Remove this process's parquet materializations at interpreter
    exit: _prune_dead only sees OTHER keys inside one live process, so
    without this every short-lived session (a test run, an
    oracle-check subprocess) leaks its temp dirs on the shared FS."""
    for path in _DIRS.values():
        shutil.rmtree(path, ignore_errors=True)
    _DIRS.clear()
    _CACHE.clear()


def shared_intermediate(
    spark: SparkSession, key: tuple, build: Callable[[], object]
) -> object:
    """Return the artifact for ``key``, building it on first use.

    DataFrame artifacts are re-materialized to session-scoped parquet
    and returned as a plain scan of that path — the registry owns the
    storage lifecycle; callers must NOT unpersist what they receive.
    Non-DataFrame artifacts (a trained centroid matrix, a plane bank)
    are stored as-is — the index-reuse path of a real ANN serving layer
    (train once per session, search many times).
    """
    app = spark.sparkContext.applicationId
    _prune_dead(app)
    full_key = (app, *key)
    obj = _CACHE.get(full_key)
    if obj is None:
        obj = build()
        if isinstance(obj, DataFrame):
            path = tempfile.mkdtemp(prefix="shared_intermediate_")
            obj.write.mode("overwrite").parquet(path)
            # the builder's transient blocks (persist/localCheckpoint)
            # are no longer needed once the reliable copy exists
            try:
                obj.unpersist()
            except Exception:
                pass
            obj = spark.read.parquet(path)
            _DIRS[full_key] = path
        _CACHE[full_key] = obj
    return obj


def evict_shared(spark: SparkSession | None = None) -> int:
    """Drop every registered intermediate and its backing storage (all
    sessions if ``spark`` is None, else just that session's). Returns
    the number of entries released."""
    app = spark.sparkContext.applicationId if spark is not None else None
    doomed = [k for k in _CACHE if app is None or k[0] == app]
    for k in doomed:
        _CACHE.pop(k)
        _drop_dir(k)
    return len(doomed)


def _prune_dead(live_app: str) -> None:
    """Drop references (and backing dirs) left behind by stopped
    sessions — their executors are gone, so there is nothing to
    unpersist, but the parquet copies still hold disk."""
    for k in [k for k in _CACHE if k[0] != live_app]:
        _CACHE.pop(k, None)
        _drop_dir(k)


def _drop_dir(full_key: tuple) -> None:
    path = _DIRS.pop(full_key, None)
    if path:
        shutil.rmtree(path, ignore_errors=True)
