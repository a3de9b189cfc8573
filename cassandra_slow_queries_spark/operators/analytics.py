"""Product-analytics operators: cohort retention, A/B comparison,
Pareto (skyline) frontier, engagement stickiness.

Classic analytics shapes the reference's report family
(analyze_slow_queries.py's aggregate reports) stops short of, each
expressed as pure DataFrame operations:

- :func:`cohort_retention` — "of the users who first converted in week
  W, how many were still active in week W+k". Two keyed aggregations
  and one user-keyed join (co-partitioned with the first shuffle), then
  one small aggregation over (cohort, offset); cohort sizes come back
  via a broadcast join of the tiny per-cohort dimension, never a second
  pass over the events.
- :func:`ab_test` — two-proportion z-test per group between two
  arms. One hash aggregation (conditional counts per arm) and
  closed-form arithmetic; the pooled-variance z-statistic and a fixed
  critical value keep the whole computation inside codegen (no SciPy,
  no driver).
- :func:`skyline_2d` — the maximal (Pareto-optimal) points under two
  maximized dimensions. Distributed two-phase skyline: collapse to one
  max-y row per distinct x (hash aggregation), local frontier per
  partition via a partition-keyed running-max window (any global
  survivor survives locally, so the union of local frontiers is a
  superset), then the exact global pass runs the same scan on that
  provably small union — the single-partition window touches only
  candidate frontier points, never the data.
- :func:`stickiness` — DAU over trailing-window distinct actives.
  The sliding COUNT(DISTINCT) is linearized by exploding each
  (day, user) activity row to the ``window_days`` days it counts
  toward (bounded × window fan-out), then one hash aggregation —
  never a per-day rescan of the window.
- :func:`survival_curve` — Kaplan-Meier product-limit estimator with
  right censoring ("how long until churn/failure, given many subjects
  leave observation early"). One hash aggregation to (group, time)
  cells, then two keyed windows over the CELLS (reverse cumulative
  at-risk count, forward cumulative log-survival) — window cost scales
  with distinct times per group, never with subjects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: two-sided 95% critical value for the z statistic
Z_CRITICAL_95 = 1.959963984540054


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
    round_digits: int = 6,
) -> DataFrame:
    """Retention matrix over ``period`` cohorts.

    A user's cohort is the ``period`` (``date_trunc``) of their first
    event in ``df``; they count as retained at offset ``k`` if they
    have any event in the cohort period + k periods. Output:
    ``(cohort, offset, n_active, cohort_size, retention)`` with
    ``retention = n_active / cohort_size`` rounded to
    ``round_digits``. Offset 0 always has ``n_active == cohort_size``.

    ``period`` must be ``"day"`` or ``"week"`` (fixed-length truncs, so
    the offset is an exact integer day-difference division; months vary
    in length and would need a months_between offset instead).
    """
    if period not in ("day", "week"):
        raise ValueError(f"period must be 'day' or 'week', got {period!r}")
    days = 1 if period == "day" else 7
    firsts = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort")
    )
    activity = df.select(
        F.col(user_col).alias("_u"),
        F.date_trunc(period, F.col(ts_col)).alias("_p"),
    ).distinct()
    # user-keyed join: the firsts side arrives hash-partitioned on _u
    # from its aggregation; the activity side re-shuffles from its
    # (_u, _p) distinct partitioning — one exchange, linear in events
    cells = (
        activity.join(firsts, "_u")
        .groupBy(
            "cohort",
            (
                F.datediff(F.col("_p"), F.col("cohort")) / days
            ).cast("long").alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return cells.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active") / F.col("cohort_size"), round_digits
        ).alias("retention"),
    )


def ab_test(
    df: DataFrame,
    group_cols: list[str],
    arm_col: str,
    arm_a: str,
    arm_b: str,
    success: Column,
    round_digits: int = 4,
) -> DataFrame:
    """Two-proportion z-test per group between arms ``arm_a`` and
    ``arm_b`` of ``arm_col``, where ``success`` is the boolean
    conversion predicate.

    Output per group: trials and conversion rates for both arms
    (``n_a, rate_a, n_b, rate_b``; a rate is NULL when its arm has no
    trials in the group — the division is guarded, not left to blow up
    under ANSI mode), the pooled-variance z-statistic ``z`` (rounded to
    ``round_digits``; NULL when either arm has no trials or the pooled
    rate is degenerate 0/1, where the test is undefined), and
    ``significant`` = |z| > 1.96 (two-sided 95%; FALSE where the test
    is undefined). Rows of other arms are ignored.
    """
    is_a = F.col(arm_col) == arm_a
    is_b = F.col(arm_col) == arm_b
    suc = success.cast("int")
    agg = (
        df.filter(is_a | is_b)
        .groupBy(*group_cols)
        .agg(
            F.sum(is_a.cast("long")).alias("n_a"),
            # coalesce inside the arm branch: a NULL success predicate
            # is a non-conversion, not a NULL that could erase the sum
            F.sum(
                F.when(is_a, F.coalesce(suc, F.lit(0))).otherwise(0)
                .cast("long")
            ).alias("_s_a"),
            F.sum(is_b.cast("long")).alias("n_b"),
            F.sum(
                F.when(is_b, F.coalesce(suc, F.lit(0))).otherwise(0)
                .cast("long")
            ).alias("_s_b"),
        )
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    # guarded: a one-armed group must yield NULL rates, not an ANSI
    # DIVIDE_BY_ZERO that kills the whole query
    p_a = F.when(F.col("n_a") > 0, F.col("_s_a") / n_a)
    p_b = F.when(F.col("n_b") > 0, F.col("_s_b") / n_b)
    pooled = (F.col("_s_a") + F.col("_s_b")) / (n_a + n_b)
    se = F.sqrt(pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b))
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0.0),
        (p_a - p_b) / se,
    )
    return agg.select(
        *group_cols,
        "n_a",
        F.round(p_a, 6).alias("rate_a"),
        "n_b",
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, round_digits).alias("z"),
        F.coalesce(F.abs(z) > Z_CRITICAL_95, F.lit(False)).alias(
            "significant"
        ),
    )


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows on the Pareto frontier maximizing ``(x_col, y_col)``.

    A row is dominated iff some other row is >= in both dimensions and
    strictly greater in at least one; exact duplicates of a frontier
    point are all kept. NULL in either dimension excludes the row.

    Plan: groupBy(x).max(y) collapses to one candidate per distinct x
    (one shuffle); a running-max window keyed by physical partition id
    filters each partition to its local frontier IN PARALLEL; the exact
    global scan then runs on the union of local frontiers — small by
    construction (each partition contributes a staircase, not its
    rows) — and the surviving (x, max_y) pairs broadcast back to pick
    up the original rows, duplicates included.
    """
    xs = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("_x"))
        .agg(F.max(y_col).alias("_maxy"))
    )

    def frontier(cands: DataFrame, *part_cols: str) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("_x").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = F.max("_maxy").over(w)
        return cands.withColumn("_prev", prev).filter(
            F.col("_prev").isNull() | (F.col("_maxy") > F.col("_prev"))
        ).drop("_prev")

    local = frontier(
        xs.withColumn("_pid", F.spark_partition_id()), "_pid"
    ).drop("_pid")
    sky = frontier(local)
    return df.join(
        F.broadcast(sky),
        (F.col(x_col) == F.col("_x")) & (F.col(y_col) == F.col("_maxy")),
        "left_semi",
    )


def stickiness(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 30,
    round_digits: int = 6,
) -> DataFrame:
    """DAU/MAU-style engagement ratio per day: distinct daily actives
    over distinct actives in the trailing ``window_days`` window
    (window 30 → classic DAU/MAU "stickiness"; 7 → DAU/WAU).

    A naive per-day COUNT(DISTINCT) over a sliding window rescans the
    window per day; instead each (day, user) activity row is exploded
    to the ``window_days`` future days it contributes to — bounded
    linear fan-out (× window) — and one hash aggregation counts
    distinct users per target day. Days with no activity report no
    row (their DAU is 0; the inner join against the DAU side also
    drops phantom trailing days past the data's end).

    Output: ``(day, dau, mau, stickiness)`` with ``stickiness =
    dau / mau`` rounded to ``round_digits``; ``mau`` is the trailing
    ``window_days`` distinct-active count regardless of window length.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    du = df.select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(user_col).alias("_u"),
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    targets = du.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), window_days - 1)
            )
        ).alias("day"),
        "_u",
    )
    mau = targets.groupBy("day").agg(F.count_distinct("_u").alias("mau"))
    return dau.join(mau, "day").select(
        "day",
        "dau",
        "mau",
        F.round(F.col("dau") / F.col("mau"), round_digits).alias(
            "stickiness"
        ),
    )


def survival_curve(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958) with right censoring, per group: at each observed duration
    ``t``, ``S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)`` where ``dᵢ`` subjects had
    their event at ``tᵢ`` and ``nᵢ`` were still AT RISK (duration ≥
    tᵢ). The estimator of "time until churn / failure / conversion"
    when many subjects leave observation before their event —
    ``event_col`` truthy means the event was observed at
    ``duration_col``; falsy (or NULL) means censored there: the
    subject leaves the at-risk pool without stepping the curve down.

    Output per (group, duration): ``n_at_risk``, ``events``,
    ``censored``, ``survival`` — one row per distinct observed
    duration (censor-only times carry the unchanged S(t), a superset
    of the classic event-time-only curve). Rows with NULL duration are
    dropped (a subject with no duration is on no curve).

    Shape: one hash aggregation collapses subjects to (group, time)
    cells, then two windows over the CELLS — at-risk counts as the
    reverse cumulative subject count, and the running product as
    ``exp(Σ log(1 − dᵢ/nᵢ))`` (the log-sum form keeps the window a
    plain SUM; a tie where everyone remaining dies makes the factor 0,
    carried as −∞ so every later time is exactly 0.0, not NULL).
    Window cost scales with distinct durations per group, never with
    subjects."""
    group_cols = group_cols or []
    t = F.col(duration_col)
    ev = F.coalesce(F.col(event_col).cast("boolean"), F.lit(False))
    cells = (
        df.filter(t.isNotNull())
        .groupBy(*group_cols, t.alias("_t"))
        .agg(
            F.sum(ev.cast("long")).alias("events"),
            F.count(F.lit(1)).alias("_total"),
        )
    )
    w_risk = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_surv = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.sum("_total").over(w_risk)
    d = F.col("events").cast("double")
    log_factor = (
        F.when(F.col("events") == 0, F.lit(0.0))
        .when(d < n, F.log1p(-d / n))
        .otherwise(F.lit(float("-inf")))
    )
    return (
        cells.withColumn("n_at_risk", n)
        .withColumn(
            "survival",
            F.round(F.exp(F.sum(log_factor).over(w_surv)), round_digits),
        )
        .select(
            *group_cols,
            F.col("_t").alias(duration_col),
            "n_at_risk",
            "events",
            (F.col("_total") - F.col("events")).alias("censored"),
            "survival",
        )
    )


#: cumulative Poisson(1) CDF F(0)..F(8): partial sums of e^-1 / i!.
#: repr-exact doubles — the catalog oracle interpolates these SAME
#: literals into its SQL, so the weight ladder is engine-identical.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
]

from cassandra_slow_queries_spark.functions.draws import md5_uniform


def _poisson1_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) draw from a uniform: the number of CDF
    thresholds at or below ``u`` — ``Σ_i (u >= F(i))`` over
    :data:`POISSON1_CDF`, which equals the CASE-ladder formulation
    (first i with ``u < F(i)``, clamped to 9 above F(8), ~1.1e-6 of
    the mass; the oracle interpolates the same literals, so parity is
    unaffected). Emitted as ONE higher-order fold over the 9-element
    literal array instead of 10 chained WHENs: with B=64 replicates the
    ladder form generated ~640 branches of aggregate code and janino
    compile time dominated small-SF runs; the fold compiles to a tiny
    loop. Pass ``u`` as a plain column reference (not an inline md5
    expression) — a lambda body re-evaluates its closed-over
    expressions per array element."""
    return F.aggregate(
        F.lit(POISSON1_CDF),
        F.lit(0),
        lambda acc, c: acc + (u >= c).cast("int"),
    )


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    replicates: int = 64,
    alpha: float = 0.05,
    salt: str = "bs",
) -> DataFrame:
    """Bootstrap confidence interval for the per-group MEAN of
    ``value_col`` via the POISSON BOOTSTRAP (Chamandy et al., "Estimating
    uncertainty for massive data streams", 2012) — the bootstrap that
    actually runs at 100 TB: classical resampling needs n draws with
    global coordination per replicate, while Poisson(1) replicate
    weights are independent PER ROW, so all ``replicates`` resamples
    ride ONE linear scan and ONE hash aggregation (2·B fixed-width
    sum columns — the explode-free agg shape the MinHash signature
    path uses; no row expansion, no shuffle beyond the group agg).

    Replicate weights are deterministic: ``w(row, b) =
    PoissonInvCDF₁(md5_uniform(id:b:salt))`` — a pure function of the
    row id, so the WHOLE interval is reproducible across runs,
    partitionings, and engines. With an INTEGRAL ``value_col`` the
    replicate sums are exact longs and every output value replays
    bit-for-bit in DuckDB (the catalog oracle does exactly that);
    fractional values work but are subject to float-sum ordering.

    CI convention (both engines, explicitly): sort the B replicate
    means ascending; ``ci_lo`` = the ``floor(alpha/2·B)+1``-th,
    ``ci_hi`` = the ``B − floor(alpha/2·B)``-th (1-based). A replicate
    whose weights all drew 0 would yield a NULL mean (probability
    e^{-n} per replicate — vanishing for any real group); NULLs sort
    last and would show up as a NULL ci_hi, not a silent skew.

    ``id_col`` must be NON-NULL for engine parity: a NULL id draws a
    NULL uniform, which the fold here excludes from every replicate
    while a SQL CASE ladder would fall through to weight 9 — filter
    null ids upstream (the catalog entry does).

    Output: group cols + ``n_items``, ``mean``, ``ci_lo``, ``ci_hi``.
    """
    if replicates < 4:
        raise ValueError("replicates must be >= 4")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    group_cols = group_cols or []
    x = F.col(value_col)

    # NULL values must not count in the replicate NUMERATOR or
    # DENOMINATOR (an unmasked weight would bias every replicate mean
    # low relative to the point mean). The masking is hoisted into ONE
    # projection — `xz` (null→0) and a 0/1 indicator — so each of the
    # 2·B aggregate expressions stays a plain ladder times a multiply.
    # The first version wrapped each ladder in WHEN(x IS NOT NULL, ...)
    # instead, which pushed the generated aggregate past the codegen
    # cliff into interpreted evaluation: 4.8 s → >600 s at sf1 on the
    # SAME data. Expression COUNT wasn't the problem; per-expression
    # conditionals were.
    rid = F.col(id_col).cast("string")
    proj = df.select(
        *group_cols,
        x.alias("_x"),
        F.coalesce(x, F.lit(0)).alias("_xz"),
        x.isNotNull().cast("long").alias("_ind"),
        # the 64 uniforms as straight-line projected columns: the md5s
        # compute exactly once per (row, replicate), and the aggregate
        # stage below stays small generated code (see _poisson1_weight)
        *[
            md5_uniform(F.concat(rid, F.lit(f":{b}:{salt}"))).alias(f"_u{b}")
            for b in range(replicates)
        ],
    )
    aggs = [
        F.count("_x").alias("n_items"),
        F.sum("_x").alias("_sx"),
    ]
    for b in range(replicates):
        w = _poisson1_weight(F.col(f"_u{b}"))
        aggs.append(F.sum(w * F.col("_xz")).alias(f"_s{b}"))
        aggs.append(F.sum(w * F.col("_ind")).alias(f"_c{b}"))

    agged = (
        proj.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else proj.groupBy().agg(*aggs)
    )
    means = F.array_sort(
        F.array(
            *[
                F.col(f"_s{b}").cast("double")
                / F.col(f"_c{b}").cast("double")
                for b in range(replicates)
            ]
        )
    )
    lo_idx = int(alpha / 2 * replicates) + 1
    hi_idx = replicates - (lo_idx - 1)
    return agged.select(
        *group_cols,
        "n_items",
        (F.col("_sx").cast("double") / F.col("n_items").cast("double")).alias(
            "mean"
        ),
        F.element_at(means, lo_idx).alias("ci_lo"),
        F.element_at(means, hi_idx).alias("ci_hi"),
    )
