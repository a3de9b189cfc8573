"""CDC merge (upsert) and scalable global row numbering.

Extension tier (no reference counterpart — the reference pipeline is a
one-shot batch job, analyze_slow_queries.py:112-148). A training-data
corpus at 100 TB is not rebuilt from scratch per intake: new crawl
batches arrive as change sets (new docs, re-crawled docs, takedown
tombstones) and must merge into the standing snapshot. The classic
engine answer is MERGE INTO; the Spark-first answer for latest-wins
semantics is cheaper than a join:

    union(snapshot, changes) → one hash shuffle on the key →
    row_number() per key over (version desc) → keep rank 1 →
    drop tombstones.

One wide shuffle total, no join node, no driver round-trips —
`merge_upsert` below. Deletes are first-class: a change row whose
``tombstone_col`` is true wins like any other version but is dropped
from the output (so a later re-insert with a higher version resurrects
the key, and an older late-arriving update cannot).

``assign_global_ids`` covers the other standing need of corpus
assembly — contiguous global ids (sample indices, shard offsets) over
a defined total order. ``Window.orderBy`` without partitioning is the
classic single-task trap; this reuses the distributed prefix-sum from
operators/curation.py with a constant weight of 1: range-partition on
the order, local row numbers per range, O(num_ranges) driver offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.curation import (
    _distributed_prefix_sum,
)

_PRIO = "_merge_prio"
_TOMB = "_merge_tomb"


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_cols: list[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge of a change set into a snapshot.

    For every key (``keys`` tuple), the surviving row is the one with
    the highest ``version_cols`` tuple across BOTH inputs; on an exact
    version tie the change row wins (the standard CDC convention —
    a re-delivered row with the same version replaces, not duplicates).
    If the winner's ``tombstone_col`` is true, the key is deleted
    (absent from the output). Output schema = snapshot schema (the
    tombstone column, if any, is dropped).

    Scale: latest-wins is a DECOMPOSABLE max, so this compiles to a
    hash aggregation — ``max_by(payload, (version..., side))`` — not a
    sort+window: partial aggregation collapses every key to one row
    per map task BEFORE the shuffle, which makes the operator immune
    to hot-key skew (a key with 10^9 versions ships ~num_tasks partial
    rows, not 10^9) and skips the per-key sort entirely. No join, so
    there is no small-side assumption either: a change set as large as
    the snapshot costs the same single shuffle of pre-combined rows.
    Among rows with an identical full version tuple AND side, the
    winner is arbitrary (same as any max over duplicates) — give
    versions a unique tiebreak column if that matters.
    """
    cols = snapshot.columns
    if tombstone_col is not None and tombstone_col not in changes.columns:
        raise ValueError(f"changes is missing tombstone column {tombstone_col!r}")
    payload = [c for c in cols if c != tombstone_col and c not in keys]

    def shaped(df: DataFrame, prio: int) -> DataFrame:
        tomb: Column = (
            F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
            if tombstone_col is not None and tombstone_col in df.columns
            else F.lit(False)
        )
        return df.select(
            *[F.col(k) for k in keys],
            *[F.col(c) for c in payload],
            tomb.alias(_TOMB),
            F.lit(prio).alias(_PRIO),
        )

    merged = shaped(snapshot, 0).unionByName(shaped(changes, 1))
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload], F.col(_TOMB)),
        F.struct(*[F.col(v) for v in version_cols], F.col(_PRIO)),
    ).alias("_w")
    out_cols = [c for c in cols if c != tombstone_col]
    return (
        merged.groupBy(*keys)
        .agg(winner)
        .filter(~F.col("_w")[_TOMB])
        .select(
            *[
                F.col(c) if c in keys else F.col("_w")[c].alias(c)
                for c in out_cols
            ]
        )
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    version_cols: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: each
    change row becomes a validity interval ``[valid_from, valid_to)``
    per key — ``valid_from`` is the row's own first version column,
    ``valid_to`` the NEXT change's (null while still current).

    The interval build is one ``lead()`` window per key — the same
    single-shuffle shape as :func:`merge_upsert`, so a full history
    rebuild costs one pass regardless of how many versions a key has.
    ``version_cols`` must strictly order each key's changes (add a
    unique tiebreak column if the timestamp alone can tie); the first
    version column supplies the interval bounds.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(v).asc() for v in version_cols])
    return (
        changes.withColumn(from_col, F.col(version_cols[0]))
        .withColumn(to_col, F.lead(F.col(version_cols[0])).over(w))
        .withColumn(current_col, F.col(to_col).isNull())
    )


def merge_agg_snapshots(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta batch's partial
    aggregate into a standing aggregate snapshot without rescanning
    history — union the two (schema-identical) aggregate frames and
    re-reduce per key.

    Only works for DECOMPOSABLE measures, which is why the API names
    them explicitly: counts and sums add (``sum_cols`` — store counts
    as a summable column), min/max fold (``min_cols``/``max_cols``).
    Derived ratios (avg = sum/count) must be recomputed from the merged
    parts at read time, never merged themselves — averaging averages is
    the classic incremental-rollup bug. Cost is one shuffle over
    |snapshot keys| + |delta keys| aggregate rows, independent of the
    history's fact row count — the point of keeping the snapshot.
    """
    sum_cols = sum_cols or []
    min_cols = min_cols or []
    max_cols = max_cols or []
    measures = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    if not measures:
        raise ValueError("no measure columns given")
    cols = keys + sum_cols + min_cols + max_cols
    return (
        snapshot.select(cols)
        .unionByName(delta.select(cols))
        .groupBy(*keys)
        .agg(*measures)
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """Snapshot diff for data versioning: classify every id across two
    corpus snapshots as ``added`` (only in new), ``removed`` (only in
    old), ``changed`` (present in both, any content column differs) or
    ``unchanged``.

    Content comparison hashes the named columns (xxhash64 — engine-local
    comparison only, both hashes computed by Spark, so no cross-engine
    portability constraint) and full-outer-joins the two 1-row-per-id
    hash frames: one shuffle of (id, hash) pairs, never of the payloads.
    Output: ``(id, status)``. The standard audit between intake runs —
    "what did yesterday's pipeline change?" — and the input to
    incremental downstream refresh (feed ``added``+``changed`` forward).

    NULLs are canonicalized BEFORE hashing: ``xxhash64`` skips NULL
    arguments entirely, so without the sentinel a value MOVING between
    content columns (``('x', NULL)`` → ``(NULL, 'x')``) would hash
    identically and a changed row would classify as ``unchanged`` —
    and the incremental refresh would silently never reprocess it. The
    string cast + ``\\x00``-sentinel keeps every column positionally
    present in the hash input (a real ``"\\x00"`` string value could
    still collide with an actual NULL — accepted and documented, the
    standard sentinel tradeoff).
    """
    def hashed(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.xxhash64(
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in content_cols
                ]
            ).alias(f"_h_{tag}"),
        )

    o = hashed(old, "old")
    n = hashed(new, "new")
    joined = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select("id", status.alias(status_col))


def assign_global_ids(
    df: DataFrame,
    order: list[Column],
    out_col: str = "global_id",
    num_ranges: int | None = None,
) -> DataFrame:
    """Contiguous 1-based global ids over the total order ``order``
    (which must be a strict total order — include a unique tiebreak
    column, or equal rows get arbitrary relative ids).

    Equivalent to ``row_number() OVER (ORDER BY order)`` but distributed:
    the unpartitioned window form plans a single-partition sort (every
    row through one task — fatal at 100 TB), while this runs a range
    exchange + per-range local windows + an O(num_ranges) driver offset
    map (see ``_distributed_prefix_sum``).

    Returns a materialized (localCheckpoint) frame so the internal
    cache is released before the caller consumes the result.
    """
    counted = df.withColumn("_one", F.lit(1).cast("long"))
    summed, ranged = _distributed_prefix_sum(
        counted, "_one", order, num_ranges, out_col=out_col
    )
    try:
        out = summed.drop("_one").localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    # keyword-only past here: to_col/current_col were INSERTED before
    # value_cols (r10), so a pre-existing positional value_cols call
    # would silently bind to to_col — fail loudly instead (r10 ADVICE)
    *,
    to_col: str = "valid_to",
    current_col: str = "is_current",
    value_cols: list[str] | None = None,
    prefix: str = "pit_",
) -> DataFrame:
    """Point-in-time feature join: each fact row gets the dimension
    version that was IN EFFECT at the fact's timestamp — the join a
    training pipeline must use when enriching examples from a mutable
    dimension, or features silently leak the future (a fact from March
    joined to the attribute value written in June).

    ``history`` is an SCD2 frame (:func:`scd2_history`): per key, the
    ``[valid_from, valid_to)`` intervals partition the timeline, so the
    version in effect at ``ts`` is exactly the latest row with
    ``valid_from <= ts`` — no interval probe needed, which reduces the
    whole lookup to the as-of join (operators/asof.py): one co-shuffle
    of facts and versions on ``keys``, per-key ordered running-last
    windows, cost linear in |facts| + |versions|, no non-equi join.
    Facts earlier than their key's first version get NULL features
    (the honest answer — the attribute did not exist yet).

    Output: every fact column, plus ``<prefix><col>`` per value column
    and ``<prefix><ts_col>`` = the matched version's ``valid_from``.

    If the history was built with RENAMED interval metadata
    (``scd2_history(to_col=..., current_col=...)``), pass the same
    names here: the default ``value_cols`` excludes them, and a
    metadata column that slipped through would surface as a
    ``pit_``-prefixed feature carrying the version's END time — the
    future-information leak this join exists to prevent.
    """
    from cassandra_slow_queries_spark.operators.asof import as_of_join

    if value_cols is None:
        value_cols = [
            c
            for c in history.columns
            if c not in set(keys)
            and c not in (from_col, to_col, current_col)
        ]
    versions = history.select(
        *keys, F.col(from_col).alias(ts_col), *value_cols
    )
    return as_of_join(
        facts, versions, keys, ts_col=ts_col, value_cols=value_cols,
        prefix=prefix,
    )
