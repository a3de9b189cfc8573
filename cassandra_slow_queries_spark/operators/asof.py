"""As-of (point-in-time) join — an operator Spark lacks natively.

"For every probe row, attach the most recent quote row at or before the
probe's timestamp, per key" — the standard point-in-time enrichment of
time-series work (prices, config versions, schema epochs). Spark has no
ASOF JOIN; the naive encodings are both scale traps:

- equi-join on key + ``quote.ts <= probe.ts`` + per-probe max: the
  non-equi conjunct forces every probe row to pair with EVERY earlier
  quote of its key before the aggregate prunes — O(|probe|·|quotes/key|)
  join rows;
- BroadcastNestedLoopJoin (what Catalyst picks without an equi-key):
  O(|probe|·|quotes|).

The scalable encoding used here is **union + ordered window**: tag both
sides, union them into one frame, and per key take the running
``last(quote value)`` over (ts, side) order. One shuffle on the key,
one local sort — the same cost as a plain groupBy, independent of the
quote-to-probe ratio. Ties (quote.ts == probe.ts) sort the quote FIRST,
so a same-instant quote is visible to the probe ("at or before"
semantics, matching DuckDB/kdb ASOF >=).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_of_join(
    probe: DataFrame,
    quotes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``probe`` row, plus ``<prefix><col>`` for
    each quote ``value_cols`` entry taken from the latest quote row of
    the same key with ``quote.ts <= probe.ts`` (NULL when no quote
    precedes the probe). Also emits ``<prefix><ts_col>`` — the matched
    quote's timestamp.

    ``quotes`` should be unique per (key, ts); if several quote rows
    share a timestamp the winner is unspecified — pre-aggregate to make
    it deterministic (the catalog entry does).

    Scale shape: both sides shuffle ONCE on ``key_cols`` (the union
    inherits one exchange), then a per-key sort feeds running
    ``last(..., ignorenulls=True)`` windows — no non-equi join, no
    nested loop, cost linear in |probe| + |quotes|. A skewed key is one
    sort partition — the same exposure as any keyed window, handled by
    AQE; there is no pairwise blow-up to amplify it.
    """
    from pyspark.sql import Window

    value_cols = value_cols or [
        c for c in quotes.columns if c not in (*key_cols, ts_col)
    ]
    probe_cols = probe.columns
    q = quotes.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),  # quotes sort before probes at equal ts
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_p_{c}")
          for c in probe_cols if c not in (*key_cols, ts_col)],
    )
    p = probe.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(quotes.schema[c].dataType).alias(f"{prefix}{c}")
          for c in value_cols],
        F.lit(None).cast(quotes.schema[ts_col].dataType).alias(
            f"{prefix}{ts_col}"
        ),
        *[F.col(c).alias(f"_p_{c}")
          for c in probe_cols if c not in (*key_cols, ts_col)],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{prefix}{c}" for c in value_cols] + [f"{prefix}{ts_col}"]
    filled = q.unionByName(p).select(
        *key_cols,
        ts_col,
        "_side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
        *[F.col(f"_p_{c}")
          for c in probe_cols if c not in (*key_cols, ts_col)],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    renames = {
        f"_p_{c}": c for c in probe_cols if c not in (*key_cols, ts_col)
    }
    return out.withColumnsRenamed(renames)
