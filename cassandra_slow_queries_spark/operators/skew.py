"""Explicit skew-salted equi-join.

AQE's runtime skew handling (pinned by the bucketed-layout tests)
splits oversized SORT-MERGE partitions, but it cannot help when the
skewed side feeds a shuffled HASH join below another operator, when
stats hide the skew until runtime, or when the join is keyed inside a
streaming stage. The classic manual remedy: SALT the hot side's key
with a fan-out suffix and EXPLODE the small side once per salt, so one
hot key becomes ``n_salts`` co-located partitions.

This module is the reusable form of the technique the as-of join
applies time-banded (operators/asof.py): deterministic, engine-neutral
salting with exact join parity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join ``left`` (big, possibly key-skewed) to ``right``
    (small: it is replicated ``n_salts``×) on column ``on``, with the
    left side's hot keys spread across ``n_salts`` salted partitions.
    Result is EXACTLY the plain join (each left row joins its key's
    right rows once — the right copy carrying that row's own salt).

    The salt is deterministic — ``xxhash64`` of ``salt_cols`` (default:
    every left column), mod ``n_salts`` — so the plan replays
    identically across runs and engines (no ``rand()``: a retried task
    re-salting differently would break exactly-once sinks).

    Pass a UNIQUE per-row column (a row id) as ``salt_cols`` when one
    exists: rows that are full duplicates — or that collapse onto few
    distinct values in the salted columns — share a salt, so a hot key
    with low residual cardinality can still pile onto few cells. A
    per-row id makes the spread ~uniform over the hot key's ROWS on
    any data, which is what a spread audit should rely on.

    ``how`` supports ``inner`` and ``left`` (an unmatched left row
    survives exactly once). Right/full outer are rejected: the
    replicated right side would emit one null-padded row PER SALT for
    an unmatched right key — silently wrong, so it raises instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}"
        )
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    cols = list(salt_cols) if salt_cols is not None else list(left.columns)
    if not cols:
        raise ValueError("salt_cols must name at least one column")
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)),
    )
    r = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    return l.join(r, [on, "_salt"], how).drop("_salt")
