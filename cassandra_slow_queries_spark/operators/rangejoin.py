"""Interval (range) join — the second join shape Spark lacks natively.

"Which intervals contain this point" / "which rows fall in this band"
over two LARGE sides. With no equi-key Catalyst plans a
BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons — and an
inequality-only theta join can't hash-partition at all. The scalable
encoding is **bucket banding**, the 1-D version of the same blocking
idea the dedup LSH operators use:

1. pick a bucket width w;
2. explode each interval into the buckets it covers
   (``floor(lo/w) .. floor((hi-1)/w)`` for half-open ``[lo, hi)``) —
   fan-out = interval length / w, bounded by construction;
3. bucket each point once (``floor(p/w)``);
4. equi-join on the bucket id (hash-partitionable, AQE-skew-splittable)
   and apply the exact ``lo <= p < hi`` residual filter.

Each (point, interval) match is produced exactly once — the point joins
only its own bucket, and the interval appears in that bucket once — so
no distinct is needed.

Width trades replication against selectivity: w ≈ median interval
length keeps per-interval fan-out at ~1-2 rows while each bucket pairs
a point with only its plausible intervals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(col_sql: str, w: int) -> Column:
    """Exact ``floor(col / w)`` over the FULL long range.

    ``F.floor(col / w)`` routes through double division, and above 2^53
    a point and its containing interval can round into DIFFERENT buckets
    — a silently dropped match (the residual filter only removes false
    positives; it cannot recover a missed bucket collision). Pure long
    arithmetic instead: ``pmod`` is non-negative, so subtracting it
    leaves an exact multiple of ``w`` and the integral ``div`` equals
    mathematical floor for negative values too. ``col_sql`` is an SQL
    snippet (``div`` has no PySpark Column operator).
    """
    return F.expr(f"(({col_sql}) - pmod(({col_sql}), {w})) div {w}")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 64,
    how: str = "inner",
) -> DataFrame:
    """Join every ``points`` row to each ``intervals`` row whose
    half-open ``[lo, hi)`` contains ``point_col``.

    Columns from both sides are kept (name collisions are the caller's
    responsibility, as with a plain join). ``how`` supports ``inner``
    and ``left`` (unmatched points survive with NULL interval columns).

    Scale shape: one explode bounded by interval-length/width, one
    hash-partitioned equi-join on the bucket id, residual filter pushed
    into the join condition — no nested loop, no cartesian pairing.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how {how!r}")
    w = int(bucket_width)
    # empty intervals match nothing — and must not reach sequence(),
    # whose auto step would count DOWN for hi-1 < lo
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _bucket_of(f"`{lo_col}`", w),
                _bucket_of(f"`{hi_col}` - 1", w),
            )
        ),
    )
    pt = points.withColumn("_bucket", _bucket_of(f"`{point_col}`", w))
    cond = (
        (pt["_bucket"] == iv["_bucket"])
        & (pt[point_col] >= iv[lo_col])
        & (pt[point_col] < iv[hi_col])
    )
    joined = pt.join(iv, cond, how)
    return joined.drop(pt["_bucket"]).drop(iv["_bucket"])
