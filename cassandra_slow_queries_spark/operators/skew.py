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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (big, possibly key-skewed) to ``right``
    (small: it is replicated ``n_salts``×) on column ``on``, with the
    left side's hot keys spread across ``n_salts`` salted partitions.
    Result is EXACTLY the plain join (each left row joins its key's
    right rows once — the right copy carrying that row's own salt).

    The salt is deterministic — ``xxhash64`` of the left row's columns,
    mod ``n_salts`` — so the plan replays identically across runs and
    engines (no ``rand()``: a retried task re-salting differently would
    break exactly-once sinks). Fully duplicated left rows share a salt;
    a hot KEY whose rows differ anywhere spreads uniformly, which is
    the skew case that matters.

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
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    )
    r = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    return l.join(r, [on, "_salt"], how).drop("_salt")
