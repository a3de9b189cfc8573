"""Ordered funnel analysis over an event stream.

"How many users did A, then B after A, then C after B" — the sequential
conversion query every event-analytics engine ships (and plain GROUP BY
cannot answer, because each step's clock starts at the PREVIOUS step's
completion for that user).

Encoding: one aggregation per step, each keyed on the user column.
Step 1 is ``min(ts)`` over step-1 events; step i joins step i's events
to the survivors of step i−1 and takes the earliest event at-or-after
the user's previous-step time (optionally within a conversion window).
Every join and groupBy keys on the SAME user column, so after the first
shuffle the stages are co-partitioned — Catalyst reuses the hash
partitioning instead of re-shuffling, and the per-step state is one row
per surviving user. Funnels are short (3-5 steps); the linear chain of
keyed aggregations is the scale-correct shape, not a window over the
whole per-user history (which would sort every user's full event list
to answer a 3-step question).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    within: str | None = None,
    persist_intermediate: bool = False,
) -> DataFrame:
    """Run an ordered funnel: ``steps`` is a list of (label, predicate).

    Returns one row per step: ``(step, step_index, n_users,
    sum_lag_us)`` — how many users completed the prefix ending at this
    step, and the exact total microseconds spent on the transition INTO
    it (NULL for the first step, which has no transition). Per-user
    step time is the EARLIEST qualifying event at-or-after the user's
    previous step time; ``within`` (e.g. ``"7 days"``) additionally
    requires each transition to land inside a conversion window.

    A user's funnel is strictly sequential: an event can satisfy step i
    only if it is not before the user's step-(i−1) time. Equal
    timestamps count (at-or-after), matching the common analytics
    definition where simultaneous events complete adjacent steps.

    The result unions one summary row per step, and each summary's
    lineage includes every earlier step — evaluated lazily, the source
    is rescanned O(steps²)/2 times across the branches.
    ``persist_intermediate=True`` persists each per-step survivor frame
    (one narrow row per surviving user — small by construction), making
    it one source scan per step; at real scale that is the right trade,
    while the lazy default keeps the operator side-effect-free
    (persisted frames outlive the returned DataFrame; callers who care
    should unpersist via ``spark.catalog.clearCache`` or accept LRU
    eviction).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    # normalize to TIMESTAMP up front: parquet written as TIMESTAMP_NTZ
    # would otherwise reject unix_micros in the lag computation. Both
    # step times get the same cast, so the lag difference is unaffected.
    u, t = F.col(user_col), F.col(ts_col).cast("timestamp")
    # NULL users can never convert: the step-2+ equi-join on _u is not
    # null-safe, so an anonymous event would count in step 1's
    # denominator and systematically understate every conversion rate
    # (SQL's COUNT(DISTINCT user) convention excludes NULLs too)
    events = events.filter(u.isNotNull())
    summaries: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, (label, pred) in enumerate(steps):
        stage = events.filter(pred).select(u.alias("_u"), t.alias("_ts"))
        if prev is None:
            reached = stage.groupBy("_u").agg(F.min("_ts").alias("_t"))
            lag = F.lit(None).cast("long")
        else:
            cond = F.col("_ts") >= F.col("_prev_t")
            if within is not None:
                cond = cond & (
                    F.col("_ts") <= F.col("_prev_t") + F.expr(f"INTERVAL {within}")
                )
            reached = (
                stage.join(
                    prev.select("_u", F.col("_t").alias("_prev_t")), "_u"
                )
                .filter(cond)
                .groupBy("_u")
                .agg(
                    F.min("_ts").alias("_t"),
                    # constant per user — min() just carries it through
                    F.min("_prev_t").alias("_prev_t"),
                )
            )
            lag = F.sum(
                F.unix_micros(F.col("_t")) - F.unix_micros(F.col("_prev_t"))
            )
        if persist_intermediate:
            reached = reached.persist()
        summaries.append(
            reached.agg(
                F.lit(label).alias("step"),
                F.lit(i + 1).alias("step_index"),
                F.count("*").alias("n_users"),
                lag.alias("sum_lag_us"),
            )
        )
        prev = reached
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out
