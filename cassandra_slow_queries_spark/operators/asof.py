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
    salt_bands: int | None = None,
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
    sort partition — the same exposure as any keyed window; there is no
    pairwise blow-up to amplify it, but at 100× scale a degenerate key
    (one symbol = half the quotes) still serializes into ONE sort task.

    ``salt_bands=N`` (round-5 verdict item 4) bounds that: the time
    axis is cut into N equal-range bands, the running fill windows on
    (key, band) — so a hot key becomes N parallel sort tasks of ~1/N
    the rows — and a per-(key, band) "carry-in" (the latest quote of
    all EARLIER bands, computed with one tiny windows-over-band-
    summaries pass, O(keys·bands) rows) seeds each band so probes whose
    matching quote lives in an earlier band still fill correctly. Band
    assignment only needs to be monotone in ts and identical across
    both sides (double-precision banding is fine — imprecision shifts
    band BOUNDARIES, never the quote-before-probe order), so the
    result is row-identical to the unsalted path (property-tested).
    Costs one extra aggregation pass for the global [min, max] ts
    (broadcast 1-row frame, no driver round-trip) — leave ``None``
    unless a key dominates the corpus.
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
    carried = [f"{prefix}{c}" for c in value_cols] + [f"{prefix}{ts_col}"]
    passthrough = [
        f"_p_{c}" for c in probe_cols if c not in (*key_cols, ts_col)
    ]
    u = q.unionByName(p)

    if salt_bands is not None and salt_bands > 1:
        filled = _banded_fill(u, key_cols, ts_col, carried, passthrough,
                              int(salt_bands))
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.select(
            *key_cols,
            ts_col,
            "_side",
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
            *passthrough,
        )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    renames = {
        f"_p_{c}": c for c in probe_cols if c not in (*key_cols, ts_col)
    }
    return out.withColumnsRenamed(renames)


def _assign_bands(u: DataFrame, ts_col: str, n_bands: int) -> DataFrame:
    """Attach ``_band`` = ``clamp(floor((ts - lo) / width), 0, N-1)``
    with [lo, hi] the frame's global ts range, computed as a broadcast
    1-row aggregate that stays in the plan (no driver action). Monotone
    in ts and identical for equal timestamps — the two facts
    :func:`_banded_fill`'s carry-in correctness rests on."""
    ts_num = F.col(ts_col).cast("double")
    bounds = F.broadcast(
        u.agg(F.min(ts_num).alias("_lo"), F.max(ts_num).alias("_hi"))
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bands))
    band = F.when(F.col("_hi") <= F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bands - 1),
            F.greatest(F.lit(0), F.floor((ts_num - F.col("_lo")) / width)),
        )
    ).cast("int")
    return u.crossJoin(bounds).withColumn("_band", band).drop("_lo", "_hi")


def band_occupancy(
    probe: DataFrame,
    quotes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    salt_bands: int = 8,
) -> DataFrame:
    """Diagnostic: rows per (key, band) sort partition the salted
    :func:`as_of_join` would create — ``(*key_cols, _band, n_rows)``.
    Uses the SAME banding as the operator (no reimplementation to
    drift), so a skew gate can pin "no single sort partition exceeds X%
    of the corpus" against the real partitioning."""
    u = quotes.select(*key_cols, ts_col).unionByName(
        probe.select(*key_cols, ts_col)
    )
    return (
        _assign_bands(u, ts_col, salt_bands)
        .groupBy(*key_cols, "_band")
        .agg(F.count("*").alias("n_rows"))
    )


def _banded_fill(
    u: DataFrame,
    key_cols: list[str],
    ts_col: str,
    carried: list[str],
    passthrough: list[str],
    n_bands: int,
) -> DataFrame:
    """The salted fill: window on (key, band) + carry-in from earlier
    bands. See :func:`as_of_join`'s ``salt_bands`` note for semantics.

    Band assignment: ``band = clamp(floor((ts - lo) / width), 0, N-1)``
    with [lo, hi] the global ts range (one aggregate, broadcast as a
    1-row frame — stays in the plan, no driver action). Monotone in ts
    by construction, so a quote in band b' < b always precedes every
    probe in band b, and equal timestamps always share a band — the two
    facts the carry-in correctness rests on.
    """
    from pyspark.sql import Window

    banded = _assign_bands(u, ts_col, n_bands)

    # Per-(key, band) summary, PER COLUMN: the latest NON-NULL quote
    # value of each carried column (conditional max_by — rows whose
    # ordering expression is NULL, i.e. probe rows and quotes where
    # THIS column is NULL, drop out). Per-column, not a latest-quote
    # struct: the unsalted path's last(ignorenulls) looks THROUGH a
    # newer quote whose column is NULL to an older non-null value, and
    # a struct carry would mask exactly that (the row-identical
    # contract would silently depend on the performance knob).
    # Aggregating over ALL rows also folds the old probe-only-band
    # universe+left-join into this one pass — such bands simply yield
    # all-NULL summaries that the cross-band last(ignorenulls) skips.
    # O(keys · bands) rows.
    summary = banded.groupBy(*key_cols, "_band").agg(
        *[
            F.max_by(
                F.col(c),
                F.when(
                    (F.col("_side") == 0) & F.col(c).isNotNull(),
                    F.col(ts_col),
                ),
            ).alias(f"_s_{c}")
            for c in carried
        ]
    )
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_band").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.select(
        *key_cols,
        "_band",
        *[
            F.last(f"_s_{c}", ignorenulls=True).over(wb).alias(f"_cry_{c}")
            for c in carried
        ],
    )

    w = (
        Window.partitionBy(*key_cols, "_band")
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        banded.join(carry, [*key_cols, "_band"], "left")
        .select(
            *key_cols,
            ts_col,
            "_side",
            *[
                F.coalesce(
                    F.last(c, ignorenulls=True).over(w),
                    F.col(f"_cry_{c}"),
                ).alias(c)
                for c in carried
            ],
            *passthrough,
        )
    )
