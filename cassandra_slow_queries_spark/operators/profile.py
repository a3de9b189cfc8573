"""Corpus profiling: per-column statistics in one distributed pass.

The "know your corpus" step every training-data pipeline runs before
filtering decisions (which columns are null-ridden, what the key
cardinalities are, whether a date column spans what you think it does).
Equivalent in spirit to warehouse ``ANALYZE``/``SUMMARIZE``, but as a
plain DataFrame so the result can be joined, diffed across snapshots,
or gated in CI.

Scale shape: ONE global aggregation computes every column's stats
(count, nulls, distinct, min, max) simultaneously — map-side combined,
no per-column scans. In ``distinct="exact"`` mode the multiple
COUNT(DISTINCT) expressions expand the input once per profiled column
(Spark's multi-distinct rewrite); ``distinct="approx"`` (the 100 TB
default) swaps them for HyperLogLog++ sketches, which merge like any
other partial aggregate — one true pass, no expansion. The catalog
entry runs exact so the oracle hash-compare is value-stable; the
sketch-vs-exact tolerance itself is gated by ``x_sketch_gate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], distinct: str = "approx"
) -> DataFrame:
    """Long-format profile of ``cols``:
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.

    ``min_value``/``max_value`` are cast to string so heterogeneous
    column types share one output schema (the consumer is a human or a
    diff, not arithmetic). ``n_distinct`` excludes NULLs (SQL
    ``COUNT(DISTINCT ...)`` semantics).
    """
    if distinct == "exact":
        d = F.count_distinct
    elif distinct == "approx":
        d = lambda c: F.approx_count_distinct(c, rsd=0.02)  # noqa: E731
    else:
        raise ValueError(f"distinct must be 'exact' or 'approx', got {distinct!r}")
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_{c}_nulls"),
            d(col).alias(f"_{c}_distinct"),
            F.min(col).cast("string").alias(f"_{c}_min"),
            F.max(col).cast("string").alias(f"_{c}_max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_{c}_nulls").alias("n_nulls"),
                F.col(f"_{c}_distinct").alias("n_distinct"),
                F.col(f"_{c}_min").alias("min_value"),
                F.col(f"_{c}_max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
