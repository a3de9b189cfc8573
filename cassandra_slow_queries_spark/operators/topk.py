"""Top-N and grouped top-K (SURVEY.md T1/T2).

``top_n`` relies on Catalyst's ``TakeOrderedAndProject`` physical operator:
each partition keeps a bounded heap of N rows and only those reach the
driver-side merge — no global sort shuffle, which is what makes a
"top 100 of 100 TB" query cheap.

``grouped_top_k`` is the rank-over-window form; the window shuffles once
on the partition keys (unavoidable — the semantics require co-locating
each group) and AQE handles skewed groups.

Both take explicit tiebreak columns: the reference's ``sorted(...)[:n]``
inherits Python's stable sort + input order, which has no parallel
equivalent — deterministic tiebreaks are the honest distributed contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(order_col: Column | str, tiebreaks: Sequence[Column | str]) -> list[Column]:
    main = F.col(order_col) if isinstance(order_col, str) else order_col
    cols = [main.desc()]
    for t in tiebreaks:
        cols.append(F.col(t).asc() if isinstance(t, str) else t)
    return cols


def top_n(
    df: DataFrame,
    order_col: Column | str,
    n: int,
    tiebreaks: Sequence[Column | str] = (),
) -> DataFrame:
    """Global descending top-N (reference sort+slice,
    analyze_slow_queries.py:1106-1112) → ``TakeOrderedAndProject``."""
    return df.orderBy(*_order(order_col, tiebreaks)).limit(n)


def grouped_top_k(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: Column | str,
    k: int,
    tiebreaks: Sequence[Column | str] = (),
) -> DataFrame:
    """Per-group descending top-K via ``row_number`` (reference per-minute
    sort+slice+flatten, analyze_slow_queries.py:1116-1121)."""
    w = Window.partitionBy(*partition_cols).orderBy(*_order(order_col, tiebreaks))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
