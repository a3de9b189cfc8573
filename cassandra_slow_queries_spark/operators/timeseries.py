"""Time-series operators: trailing windows, gap-filling resample,
robust outlier flagging, rolling-origin backtest folds.

All are expression-only (no Python in any hot path) and shuffle
once on the series key (:func:`time_folds` not at all — a bounded
explode against a broadcast 1-row span):

- :func:`trailing_agg` — RANGE-frame window (event-time span, not row
  count), the correct frame for irregular event streams where "last
  hour" covers a different number of rows per event.
- :func:`resample` — dense fixed-step grid per key (``sequence`` +
  explode over the key's own span) left-joined to the observations,
  with optional forward fill via ``last(..., ignorenulls=True)`` or
  exact linear interpolation between the surrounding observations. The
  grid explode is per-key-span, so total grid size is Σ span/step —
  the caller controls density with ``step_seconds``; nothing
  materializes on the driver.
- :func:`mad_outliers` — median/MAD robust z-score per group. MAD
  needs two dependent medians, so it is two keyed aggregations and a
  broadcast-back join of the tiny per-group stats — deliberately NOT a
  per-group window over the full history (grouped exact medians
  already shuffle once; the windowed form would sort every group's
  full history twice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _duration_micros(duration: str) -> int:
    """Parse ``"<n> <unit>"`` to microseconds (seconds/minutes/hours/
    days; singular or plural). RANGE window bounds must be literal
    longs, so the span is resolved driver-side, not as an expression."""
    units = {
        "second": 1_000_000,
        "minute": 60 * 1_000_000,
        "hour": 3_600 * 1_000_000,
        "day": 86_400 * 1_000_000,
    }
    parts = duration.strip().split()
    if len(parts) != 2:
        raise ValueError(f"duration must be '<n> <unit>', got {duration!r}")
    n = int(parts[0])
    unit = parts[1].rstrip("s").lower()
    if n <= 0 or unit not in units:
        raise ValueError(f"unsupported duration {duration!r}")
    return n * units[unit]


def trailing_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    duration: str = "1 hour",
) -> DataFrame:
    """Event-time trailing aggregates: every input row annotated with
    each aggregate in ``aggs`` evaluated over that key's rows in
    ``[ts − duration, ts]`` (inclusive both ends — equal-timestamp
    peers sit in each other's frame, standard RANGE semantics).

    The frame is a RANGE frame over ``unix_micros(ts)``: a ROWS frame
    ("last N rows") is wrong on irregular streams, where event density
    differs per window. One shuffle on ``key_cols``, per-key sort
    inside each partition. ``aggs`` maps output column name → aggregate
    Column over input columns, e.g. ``{"n": F.count(F.lit(1)),
    "avg_v": F.avg("value")}``.
    """
    span = _duration_micros(duration)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(micros.alias("_us"))
        .rangeBetween(-span, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int = 60,
    fill: str = "ffill",
) -> DataFrame:
    """Resample an irregular series onto a dense fixed-step grid per
    key: one row per ``step_seconds`` tick from each key's first
    observation through its last (ticks aligned to the epoch grid via
    floor), carrying the LAST observation in each bucket and — with
    ``fill="ffill"`` — forward-filling empty buckets from the most
    recent earlier bucket. ``fill="interp"`` linearly interpolates
    empty buckets between the surrounding observed buckets instead
    (the right fill for sampled continuous signals — a gauge, a rate —
    where ffill's step function misstates the trajectory); the grid
    spans first→last observation per key, so every gap has an observed
    bucket on both sides and the interpolated series is total (no
    NULLs). ``fill="none"`` leaves gaps NULL.

    Output: ``(*key_cols, bucket_ts, value)``. Buckets before a key's
    first observation do not exist (nothing to fill from). Multiple
    observations in one bucket resolve to the latest by event time,
    ties by greatest value (``max_by`` tie semantics made deterministic
    by ordering on (ts, value)).

    Interpolation adds one more keyed window over the same
    partitioning as the ffill path (no extra shuffle): the previous /
    next observed (bucket, value) pairs come from ``last(...,
    ignorenulls)`` / ``first(..., ignorenulls)`` frames, then the
    value is the exact linear blend ``prev + (next - prev) * (t -
    t_prev) / (t_next - t_prev)`` in double arithmetic.
    """
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    if fill not in ("ffill", "interp", "none"):
        raise ValueError(
            f"fill must be 'ffill', 'interp' or 'none', got {fill!r}"
        )
    step = F.lit(step_seconds).cast("long")
    # a row with a NULL value is NOT an observation: kept, it would win
    # a bucket's latest-by-ts struct max and shadow an earlier real
    # reading (turning an observed bucket into a gap), and a NULL
    # boundary observation would void the "interpolated series is
    # total" guarantee by propagating NULL through prev/next blending
    df = df.filter(F.col(value_col).isNotNull())
    sec = (F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000).cast(
        "long"
    )
    bucket = (F.floor(sec / step) * step).cast("long")
    # last observation per (key, bucket): deterministic max_by on the
    # (ts, value) struct
    obs = (
        df.select(
            *key_cols,
            bucket.alias("bucket_sec"),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("ts"),
                F.col(value_col).alias("v"),
            ).alias("_ob"),
        )
        .groupBy(*key_cols, "bucket_sec")
        .agg(F.max("_ob")["v"].alias("_bucket_value"))
    )
    spans = df.groupBy(*key_cols).agg(
        (F.floor(F.min(sec) / step) * step).cast("long").alias("_lo"),
        (F.floor(F.max(sec) / step) * step).cast("long").alias("_hi"),
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), step)
        ).alias("bucket_sec"),
    )
    joined = grid.join(obs, [*key_cols, "bucket_sec"], "left")
    if fill == "ffill":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("bucket_sec")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        value = F.last("_bucket_value", ignorenulls=True).over(w)
    elif fill == "interp":
        wb = (
            Window.partitionBy(*key_cols)
            .orderBy("bucket_sec")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*key_cols)
            .orderBy("bucket_sec")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_sec = F.when(
            F.col("_bucket_value").isNotNull(), F.col("bucket_sec")
        )
        prev_v = F.last("_bucket_value", ignorenulls=True).over(wb)
        prev_s = F.last(obs_sec, ignorenulls=True).over(wb)
        next_v = F.first("_bucket_value", ignorenulls=True).over(wf)
        next_s = F.first(obs_sec, ignorenulls=True).over(wf)
        # observed bucket → prev==next==current, blend degenerates to
        # the observation; interior gap → exact linear blend; the grid
        # never extends past the observed span, so prev/next both exist
        frac = (
            (F.col("bucket_sec") - prev_s).cast("double")
            / (next_s - prev_s).cast("double")
        )
        value = F.when(next_s == prev_s, prev_v).otherwise(
            prev_v + (next_v - prev_v) * frac
        )
    else:
        value = F.col("_bucket_value")
    return joined.select(
        *key_cols,
        F.timestamp_seconds(F.col("bucket_sec")).alias("bucket_ts"),
        value.alias("value"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flags: modified z-score
    ``0.6745·(x − median) / MAD`` (Iglewicz & Hoaglin's 1993 rule;
    0.6745 rescales MAD to σ under normality), flagging
    ``|z| > threshold``. Median/MAD instead of mean/stddev so the
    outliers being hunted cannot mask themselves by inflating the
    spread.

    Two keyed aggregations (median of x, then median of |x − median|)
    plus a broadcast join of the tiny per-group stats back onto the
    rows. A zero-MAD group (over half the values identical) yields NULL
    z-scores and ``is_outlier=false`` for exact-median rows — flagged
    true for any row differing from the median (the degenerate-MAD
    convention: in a constant group, anything else is an outlier).

    Output: input columns + ``(median, mad, z, is_outlier)``.
    """
    x = F.col(value_col).cast("double")

    def _back_join(rows: DataFrame, stats: DataFrame) -> DataFrame:
        # null-safe: groupBy computed a stats row for the NULL group,
        # and a plain equi-join would silently drop exactly those input
        # rows from the output (the scale_features eqNullSafe rule)
        aliased = stats.select(
            *[F.col(g).alias(f"_mo_{g}") for g in group_cols],
            *[c for c in stats.columns if c not in group_cols],
        )
        cond = None
        for g in group_cols:
            piece = F.col(g).eqNullSafe(F.col(f"_mo_{g}"))
            cond = piece if cond is None else cond & piece
        return rows.join(F.broadcast(aliased), cond).drop(
            *[f"_mo_{g}" for g in group_cols]
        )

    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("median")
    )
    with_med = _back_join(df, med)
    mad = (
        with_med.groupBy(*group_cols)
        .agg(
            F.expr(f"percentile(abs({value_col} - median), 0.5)").alias("mad")
        )
    )
    scored = _back_join(with_med, mad)
    z = F.when(
        F.col("mad") > 0, 0.6745 * (x - F.col("median")) / F.col("mad")
    )
    # qdec, not ROUND: z is a ratio of terminating decimals scaled by
    # 0.6745 — a terminating rational that can land on the half
    # boundary where engines' ROUND diverge (r9 ADVICE).
    from cassandra_slow_queries_spark.functions.quantize import qdec

    return scored.select(
        *df.columns,
        "median",
        "mad",
        qdec(z).alias("z"),
        # NULL value → false, not NULL: "is_outlier" is a verdict
        # column; an unobserved value is not an outlier
        F.when(x.isNull(), F.lit(False))
        .when(F.col("mad") > 0, F.abs(z) > threshold)
        .otherwise(x != F.col("median"))
        .alias("is_outlier"),
    )


def time_folds(
    df: DataFrame,
    ts_col: str,
    n_folds: int = 3,
) -> DataFrame:
    """Rolling-origin (expanding-window) cross-validation folds — the
    correct backtest layout for anything time-ordered, where a random
    split would let the model train on the future it is asked to
    predict.

    The observed time span splits into ``n_folds + 1`` equal slices in
    exact integer microseconds. Fold ``i`` (1-based) trains on
    everything BEFORE cutoff ``i`` and validates on slice ``i`` (the
    last fold's window closes inclusively at the max timestamp). The
    first slice is the seed history: it only ever trains; every row at
    or after the first cutoff validates in exactly one fold. Output:
    the input
    columns plus ``(fold, role)`` with ``role ∈ {'train', 'valid'}``;
    rows after a fold's validation window carry no row for that fold
    (they belong to later folds' training sets). Fan-out is exactly
    ``n_folds`` rows per input row minus the excluded tail — bounded
    and explicit, the same linearization trade as
    ``analytics.stickiness``.

    The span statistics are a 1-row aggregate broadcast back (no
    driver action); cutoff arithmetic is integer division, so fold
    membership is deterministic and engine-portable.

    Rows with a NULL (or unparseable) ``ts_col`` are dropped — a row
    that cannot be placed on the timeline belongs to no fold on either
    side of any cutoff (silently training on it would leak it into
    every fold instead).
    """
    if n_folds < 1:
        raise ValueError("n_folds must be >= 1")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    span = df.groupBy().agg(
        F.min(us).alias("_lo"), F.max(us).alias("_hi")
    )
    width = F.floor(
        (F.col("_hi") - F.col("_lo")) / F.lit(n_folds + 1)
    ).cast("long")
    folded = (
        df.withColumn("_us", us)
        .crossJoin(F.broadcast(span))
        .select(
            "*",
            F.explode(
                F.sequence(F.lit(1), F.lit(n_folds))
            ).alias("fold"),
        )
    )
    cutoff = F.col("_lo") + F.col("fold") * width
    # last fold's validation window closes at _hi inclusively; earlier
    # folds close exclusively at the next cutoff
    win_end = F.when(
        F.col("fold") == n_folds, F.col("_hi") + 1
    ).otherwise(cutoff + width)
    role = F.when(F.col("_us") < cutoff, "train").when(
        F.col("_us") < win_end, "valid"
    )
    return (
        folded.withColumn("role", role)
        .filter(F.col("role").isNotNull())
        .drop("_us", "_lo", "_hi")
    )
