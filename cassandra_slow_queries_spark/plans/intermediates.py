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
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, object] = {}


def shared_intermediate(
    spark: SparkSession, key: tuple, build: Callable[[], object]
) -> object:
    """Return the artifact for ``key``, building it on first use.

    DataFrame artifacts: ``build`` must return an already-persisted
    (ideally eagerly materialized) frame; the registry owns its
    lifecycle from then on — callers must NOT unpersist what they
    receive. Non-DataFrame artifacts (a trained centroid matrix, a
    plane bank) are stored as-is — the index-reuse path of a real ANN
    serving layer (train once per session, search many times).
    """
    app = spark.sparkContext.applicationId
    _prune_dead(app)
    full_key = (app, *key)
    df = _CACHE.get(full_key)
    if df is None:
        df = build()
        _CACHE[full_key] = df
    return df


def evict_shared(spark: SparkSession | None = None) -> int:
    """Unpersist and drop every registered intermediate (all sessions if
    ``spark`` is None, else just that session's). Returns the number of
    entries released."""
    app = spark.sparkContext.applicationId if spark is not None else None
    doomed = [k for k in _CACHE if app is None or k[0] == app]
    for k in doomed:
        obj = _CACHE.pop(k)
        if isinstance(obj, DataFrame):
            try:
                obj.unpersist()
            except Exception:  # session already stopped — nothing to release
                pass
    return len(doomed)


def _prune_dead(live_app: str) -> None:
    """Drop references left behind by stopped sessions (their executors
    are gone, so there is nothing to unpersist)."""
    for k in [k for k in _CACHE if k[0] != live_app]:
        _CACHE.pop(k, None)
