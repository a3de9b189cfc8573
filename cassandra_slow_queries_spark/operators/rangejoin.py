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


def _tuned_width(intervals: DataFrame, lo_col: str, hi_col: str) -> int:
    """Median non-empty interval length via ``approxQuantile`` (one
    distributed pass, O(1) driver result). Falls back to 64 when the
    intervals frame is empty — the width is then irrelevant anyway."""
    quantiles = (
        intervals.select(
            (F.col(hi_col) - F.col(lo_col)).cast("double").alias("_len")
        )
        .filter(F.col("_len") > 0)
        .approxQuantile("_len", [0.5], 0.01)
    )
    return max(1, int(quantiles[0])) if quantiles else 64


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int | None = None,
    how: str = "inner",
    spread: bool = True,
) -> DataFrame:
    """Join every ``points`` row to each ``intervals`` row whose
    half-open ``[lo, hi)`` contains ``point_col``.

    Columns from both sides are kept (name collisions are the caller's
    responsibility, as with a plain join). ``how`` supports ``inner``
    and ``left`` (unmatched points survive with NULL interval columns).

    ``bucket_width=None`` (default) self-tunes to the MEDIAN interval
    length, estimated with one distributed ``approxQuantile`` pass over
    the intervals side (small driver result, like any stats collection).
    A fixed width is a footgun the caller can't see: intervals much
    longer than the width pay length/width explode fan-out, width much
    longer than the intervals pairs each point with every interval in
    an over-wide bucket — median length keeps per-interval fan-out at
    ~1-2 rows while buckets stay selective. Pass an explicit width to
    skip the estimation pass (e.g. when calling in a loop, or when the
    length distribution is known and heavily skewed — a few huge
    intervals pull their own fan-out up under any width choice, but a
    heavy long tail may justify a width above the median).

    Result rows are identical for ANY width (the residual filter is
    exact; property-tested across adversarial width/length ratios) —
    width is purely a performance knob.

    Scale shape: one explode bounded by interval-length/width, one
    hash-partitioned equi-join on the bucket id, residual filter pushed
    into the join condition — no nested loop, no cartesian pairing.

    The points side routes through ``spread_input`` (the standing
    narrow-scan guard, a no-op on many-file corpora and streaming
    frames): the intervals side is typically broadcast-small, so the
    join's parallelism IS the points scan's split count — a
    single-row-group landing file would otherwise serialize the entire
    pair fan-out onto one core (measured: 11.3 G pairs on 1-3 cores at
    sf3 before the guard, 29 s across 32 after). ``spread=False``
    skips the guard (and its ``df.rdd`` planning pass) — pair it with
    an explicit ``bucket_width`` when calling in a loop on small
    in-memory frames, where a per-call exchange to full shuffle
    parallelism costs more than it saves.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how {how!r}")
    # INTEGRAL coordinates only: the bucket cover uses `hi - 1` (exact
    # half-open arithmetic on integers). Doubles fail loudly at
    # analysis, but DECIMAL coordinates would type-check and then
    # silently DROP true matches — an interval [63.9, 64.5) covers
    # bucket(63.5)..=0 while its point 64.2 sits in bucket 1 and the
    # equi-join never pairs them. Fail eagerly instead.
    integral = ("byte", "short", "int", "bigint", "long", "integer", "smallint", "tinyint")
    for frame, col in ((points, point_col), (intervals, lo_col), (intervals, hi_col)):
        t = frame.schema[col].dataType.simpleString()
        if t not in integral:
            raise ValueError(
                f"interval_join needs integral coordinates; {col!r} is "
                f"{t} — scale to integers (e.g. epoch micros) upstream"
            )
    w = (
        int(bucket_width)
        if bucket_width is not None
        else _tuned_width(intervals, lo_col, hi_col)
    )
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
    if spread:
        from cassandra_slow_queries_spark.session import spread_input

        # round-robin (by=None), not hash-by-point: the operator has no
        # unique column to hash on, and a skewed point distribution
        # would re-collapse a hash spread onto few partitions — the
        # exact failure this guard exists to prevent. Placement doesn't
        # affect results (the bucket equi-join re-partitions logically
        # by bucket anyway).
        points = spread_input(points)
    pt = points.withColumn("_bucket", _bucket_of(f"`{point_col}`", w))
    cond = (
        (pt["_bucket"] == iv["_bucket"])
        & (pt[point_col] >= iv[lo_col])
        & (pt[point_col] < iv[hi_col])
    )
    joined = pt.join(iv, cond, how)
    return joined.drop(pt["_bucket"]).drop(iv["_bucket"])


def interval_agg(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    sum_cols: tuple[str, ...] | list[str] = (),
    min_cols: tuple[str, ...] | list[str] = (),
    max_cols: tuple[str, ...] | list[str] = (),
    count_name: str = "n_points",
    bucket_width: int | None = None,
    spread: bool = True,
    keep_empty_intervals: bool = False,
) -> DataFrame:
    """Distributive per-interval aggregates (count/sum/min/max) over the
    half-open containment predicate WITHOUT materializing one row per
    (point, interval) pair.

    ``interval_join(...).groupBy(interval cols).agg(count, sum)`` pays
    the TRUE match volume — and on a FIXED value domain that volume is
    quadratic in data density (the r13 exponent tier measured the
    catalog's range-join entry at 1.27 G pairs @ sf1 → 11.27 G @ sf3,
    wall_exp 1.94; BASELINE.md r13 ledger). When the consumer only
    needs distributive aggregates, the pairs are pure overhead: this
    operator aggregates the points side BY VALUE first (one hash
    aggregation, the map-side-combinable kind), interval-joins the
    resulting histogram, and re-aggregates the per-value partials per
    interval. Pair volume collapses from
    Σ_i |{points in [lo_i, hi_i)}| to Σ_i |{DISTINCT values in
    [lo_i, hi_i)}| ≤ Σ_i (hi_i − lo_i) — bounded by interval length and
    the value domain, INDEPENDENT of row count. Density² becomes
    density×domain; at worst (all-unique values) it equals the pair
    plan plus one cheap aggregation.

    Returns one row per MATCHED interval (all ``intervals`` columns,
    then ``count_name``, ``sum_<c>`` / ``min_<c>`` / ``max_<c>`` per
    ``sum_cols`` / ``min_cols`` / ``max_cols`` entry) — inner-join
    semantics, identical to the pair plan it replaces; zero-match
    intervals are absent from both. ``keep_empty_intervals=True``
    switches to the standard SQL ``intervals LEFT JOIN points … GROUP
    BY interval-cols`` shape instead: one row per DISTINCT interval
    tuple, zero-match rows kept with ``count_name`` 0 and NULL
    sum/min/max (SQL empty-group aggregates) — duplicate interval rows
    collapse into one group whose counts see every duplicate's matches,
    exactly as that SQL does. Every agg column list may include
    ``point_col`` itself. sum/min/max ignore NULLs exactly as the SQL
    aggregates they compose from do (a per-value partial of all-NULL
    rows is NULL, and NULL partials are in turn ignored by the
    per-interval re-aggregation — associativity of distributive
    aggregates is the whole trick). Width/spread knobs pass through to
    :func:`interval_join` (the histogram side is the "points" side
    there — ``spread`` guards the original scan via the aggregation's
    shuffle, so it matters mainly for very narrow inputs).
    """
    sum_cols = list(sum_cols)
    min_cols = list(min_cols)
    max_cols = list(max_cols)
    h = points.groupBy(point_col).agg(
        F.count(F.lit(1)).alias("_ia_cnt"),
        *[F.sum(c).alias(f"_ia_sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"_ia_min_{c}") for c in min_cols],
        *[F.max(c).alias(f"_ia_max_{c}") for c in max_cols],
    )
    joined = interval_join(
        h,
        intervals,
        point_col,
        lo_col,
        hi_col,
        bucket_width=bucket_width,
        spread=spread,
    )
    iv_cols = intervals.columns
    agged = joined.groupBy(*iv_cols).agg(
        F.sum("_ia_cnt").alias(count_name),
        *[F.sum(f"_ia_sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        *[F.min(f"_ia_min_{c}").alias(f"min_{c}") for c in min_cols],
        *[F.max(f"_ia_max_{c}").alias(f"max_{c}") for c in max_cols],
    )
    if not keep_empty_intervals:
        return agged
    # distinct() mirrors the SQL GROUP BY over the left join: duplicate
    # interval tuples are one group there too, and `agged` already
    # carries each group's duplicate-inclusive totals
    return (
        intervals.distinct()
        .join(agged, on=iv_cols, how="left")
        .withColumn(count_name, F.coalesce(F.col(count_name), F.lit(0)))
    )
