"""Event-sequence analysis: first-order (Markov) transition statistics.

The reference engine's per-key ordered scans (analyze_slow_queries.py's
per-PK minute walks) stop at counts; a training-data / behavioral
pipeline also wants *what follows what*: the per-user bigram of
consecutive event states and the empirical transition probabilities —
the building block for session modeling, anomaly scoring (improbable
transitions), and synthetic-sequence generation.

Scale shape: one keyed window (partition by the sequence key — millions
of users means millions of small partitions, no single-task sort) to
form consecutive (prev, next) pairs, then one aggregation whose output
cardinality is |states|² — tiny regardless of input size, so the final
probability normalization can run as a second aggregation over the
already-collapsed matrix instead of a window over raw rows. Partial
(map-side) aggregation absorbs most of the bigram shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.quantize import qdec


def transition_pairs(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_by: list[Column | str],
) -> DataFrame:
    """Consecutive (prev_state, next_state) pairs within each key's
    sequence, ordered by ``order_by`` (pass a strict total order — add a
    unique tiebreak column — or pair formation is nondeterministic).
    The first event of each sequence has no predecessor and emits no
    pair.

    NULL states break the chain SYMMETRICALLY: lag() cannot distinguish
    "first event" from "previous state was NULL", so a one-sided filter
    would drop (NULL→x) pairs while emitting (x→NULL) — deflating
    p(x→real states) in the matrix normalization. Neither direction of
    a NULL-state event forms a pair."""
    w = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        df.withColumn("_prev", F.lag(F.col(state_col)).over(w))
        .filter(F.col("_prev").isNotNull() & F.col(state_col).isNotNull())
        .select(
            F.col("_prev").alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_by: list[Column | str],
    prob_digits: int | None = 6,
) -> DataFrame:
    """Empirical first-order transition matrix over per-key sequences:
    ``(prev_state, next_state, n, p)`` where ``p = n / Σ n`` over the
    same ``prev_state`` row. ``p`` is rounded to ``prob_digits`` for
    cross-engine float parity (None → unrounded).

    The row-sum normalization runs on the collapsed |states|² matrix
    (a window over at most |states| rows per partition), never on the
    raw event stream — at 100 TB the matrix is still a few KB.
    """
    counts = (
        transition_pairs(df, key_col, state_col, order_by)
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = Window.partitionBy("prev_state")
    p = F.col("n") / F.sum("n").over(row_tot)
    if prob_digits is not None:
        # qdec, not ROUND: p is a terminating rational (count ratio)
        # that can land exactly on the half boundary where engine
        # ROUNDs disagree (functions/quantize.py)
        p = qdec(p, prob_digits)
    return counts.withColumn("p", p)
