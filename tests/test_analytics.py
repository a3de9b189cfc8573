"""Unit tests for the product-analytics operators
(operators/analytics.py: cohort retention, A/B z-test, 2D skyline) and
the market-basket rules (operators/basket.py); their events/orders/
lineitem catalog entries are oracle-checked by test_entry_oracle.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.analytics import (
    ab_test,
    cohort_retention,
    skyline_2d,
)
from cassandra_slow_queries_spark.operators.basket import association_rules


def test_cohort_retention_hand_computed(spark):
    rows = [
        # cohort week of 2024-01-01 (Mon): u1 active wk0+wk1, u2 wk0 only
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-09 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        # cohort week of 2024-01-08: u3 active wk0 and wk2
        (3, "2024-01-10 10:00:00"),
        (3, "2024-01-24 10:00:00"),
        # duplicate events in one week count once
        (1, "2024-01-02 11:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {
        (r["cohort"].strftime("%Y-%m-%d"), r["offset"]): r.asDict()
        for r in cohort_retention(df, "user_id", "ts", "week").collect()
    }
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 0)]["cohort_size"] == 2
    assert out[("2024-01-01", 0)]["retention"] == 1.0
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention"] == 0.5
    assert out[("2024-01-08", 0)]["n_active"] == 1
    assert out[("2024-01-08", 2)]["n_active"] == 1
    # no offset-1 cell for the second cohort (u3 inactive that week)
    assert ("2024-01-08", 1) not in out
    assert len(out) == 4


def test_cohort_retention_day_period(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00"), (1, "2024-01-03 05:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    offs = {
        r["offset"]
        for r in cohort_retention(df, "user_id", "ts", "day").collect()
    }
    assert offs == {0, 2}


def test_ab_test_closed_form(spark):
    # arm a: 10 trials 6 successes; arm b: 10 trials 2 successes
    rows = [("a", 1.0 if i < 6 else 0.0) for i in range(10)]
    rows += [("b", 1.0 if i < 2 else 0.0) for i in range(10)]
    rows += [("c", 1.0)]  # other arms ignored
    df = spark.createDataFrame(rows, "arm string, v double").withColumn(
        "g", F.lit("x")
    )
    out = ab_test(
        df, ["g"], "arm", "a", "b", F.col("v") > 0.5
    ).collect()[0]
    p, se = 0.4, math.sqrt(0.4 * 0.6 * 0.2)
    assert out["n_a"] == 10 and out["n_b"] == 10
    assert out["rate_a"] == 0.6 and out["rate_b"] == 0.2
    assert out["z"] == round((0.6 - 0.2) / se, 4)
    assert out["significant"] == (abs((0.6 - 0.2) / se) > 1.96)


def test_ab_test_degenerate_rates_null_z(spark):
    # both arms all-failure → pooled p = 0 → z undefined (NULL)
    df = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0)], "arm string, v double"
    ).withColumn("g", F.lit("x"))
    out = ab_test(df, ["g"], "arm", "a", "b", F.col("v") > 0.5).collect()[0]
    assert out["z"] is None
    assert out["significant"] is False


def test_skyline_dominance_and_duplicates(spark):
    rows = [
        (1, 10.0, 5.0),   # frontier
        (2, 10.0, 5.0),   # exact duplicate of a frontier point: kept
        (3, 10.0, 4.0),   # dominated within equal x (smaller y)
        (4, 8.0, 7.0),    # frontier (higher y than everything right of it)
        (5, 9.0, 5.0),    # dominated by (10, 5)
        (6, 8.0, 7.0),    # duplicate frontier point
        (7, 12.0, 1.0),   # frontier (max x)
        (8, None, 9.0),   # NULL dimension: excluded
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    kept = {
        r["id"] for r in skyline_2d(df, "x", "y").collect()
    }
    assert kept == {1, 2, 4, 6, 7}


def test_skyline_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, float(rng.randrange(20)), float(rng.randrange(20)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    kept = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    expect = {
        i
        for i, x, y in rows
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for _, qx, qy in rows
        )
    }
    assert kept == expect


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_association_rules_hand_computed(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "d"),       # d appears once: pruned by min_item_count
        (5, "a"), (5, "a"),       # duplicate (basket, item) counts once
    ]
    out = {
        (r["antecedent"], r["consequent"]): r.asDict()
        for r in association_rules(
            _baskets(spark, rows), "basket", "item",
            min_item_count=2, min_pair_count=2,
        ).collect()
    }
    # pair (a,b) in baskets 1,2; counts: a=4, b=3, n_baskets=5
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2
    assert ab["support"] == 2 / 5
    assert ab["confidence"] == 2 / 4
    assert ab["lift"] == (2 / 4) / (3 / 5)
    ba = out[("b", "a")]
    assert ba["confidence"] == 2 / 3
    # lift is symmetric up to FP association: (2/4)/(3/5) vs (2/3)/(4/5)
    assert abs(ba["lift"] - ab["lift"]) < 1e-12
    # (a,c) in baskets 1,3 → present; no rule involves d
    assert ("a", "c") in out and ("c", "a") in out
    assert not any("d" in k for k in out)
    assert len(out) == 4


def test_association_rules_basket_cap_bounds_fanout(spark):
    rows = [(1, f"i{j}") for j in range(50)]  # one mega-basket
    rows += [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    out = association_rules(
        _baskets(spark, rows), "basket", "item",
        min_item_count=1, min_pair_count=1, max_basket_size=10,
    ).collect()
    # mega-basket dropped: only the (i0, i1) pair from baskets 2 and 3
    assert {(r["antecedent"], r["consequent"]) for r in out} == {
        ("i0", "i1"), ("i1", "i0")
    }
    assert all(r["pair_count"] == 2 for r in out)


def test_resample_interp_linear_blend(spark):
    from cassandra_slow_queries_spark.operators.timeseries import resample

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:30", 10.0),
            (1, "2024-01-01 03:00:30", 40.0),   # 3 empty minutes between
            (1, "2024-01-01 04:00:30", 20.0),
        ],
        "k long, ts_s string, v double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    out = {
        r["bucket_ts"].strftime("%H:%M"): r["value"]
        for r in resample(
            df, ["k"], "ts", "v", step_seconds=3600, fill="interp"
        ).collect()
    }
    assert out["00:00"] == 10.0
    assert out["01:00"] == 20.0
    assert out["02:00"] == 30.0
    assert out["03:00"] == 40.0
    assert out["04:00"] == 20.0
    assert len(out) == 5


def test_stickiness_hand_computed(spark):
    rows = [
        (1, "2024-01-01 01:00:00"),
        (2, "2024-01-01 02:00:00"),
        (1, "2024-01-02 01:00:00"),
        (3, "2024-01-03 01:00:00"),
        # duplicate user-day events count once
        (1, "2024-01-02 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    from cassandra_slow_queries_spark.operators.analytics import stickiness

    out = {
        r["day"].isoformat(): (r["dau"], r["mau"], r["stickiness"])
        for r in stickiness(df, "user_id", "ts", window_days=2).collect()
    }
    # day1: dau 2 (u1,u2), window {day0,day1} actives = 2
    assert out["2024-01-01"] == (2, 2, 1.0)
    # day2: dau 1 (u1), window {day1,day2} actives = {1,2} = 2
    assert out["2024-01-02"] == (1, 2, 0.5)
    # day3: dau 1 (u3), window {day2,day3} actives = {1,3} = 2
    assert out["2024-01-03"] == (1, 2, 0.5)
    # no phantom day4 row (u3's explode lands there but no activity)
    assert len(out) == 3


def test_rrf_fusion_hand_computed(spark):
    from cassandra_slow_queries_spark.operators.search import (
        rrf_fuse,
        with_rank,
    )

    a = with_rank(
        spark.createDataFrame(
            [(10, 5.0), (20, 4.0), (30, 3.0)], "doc_id long, score double"
        ),
        "score",
    )
    b = with_rank(
        spark.createDataFrame(
            [(20, 0.9), (40, 0.8)], "doc_id long, score double"
        ),
        "score",
    )
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([a, b], rrf_k=60, topk=10).collect()
    }
    # doc 20: rank 2 in a, rank 1 in b
    assert out[20] == (round(1 / 62 + 1 / 61, 6), 2)
    assert out[10] == (round(1 / 61, 6), 1)
    assert out[30] == (round(1 / 63, 6), 1)
    assert out[40] == (round(1 / 62, 6), 1)
    # doc in both lists outranks every single-list doc
    assert out[20][0] > max(v[0] for k, v in out.items() if k != 20)


def test_with_rank_ties_break_on_id(spark):
    from cassandra_slow_queries_spark.operators.search import with_rank

    df = spark.createDataFrame(
        [(2, 1.0), (1, 1.0), (3, 2.0)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r["rank"] for r in with_rank(df, "score").collect()}
    assert out == {3: 1, 1: 2, 2: 3}


def test_ab_test_one_armed_group_null_rates(spark):
    # a group with rows for only ONE arm must yield NULL for the empty
    # arm's rate and NULL z — not an ANSI DIVIDE_BY_ZERO crash
    df = spark.createDataFrame(
        [("g1", "a", 1.0), ("g1", "a", 0.0), ("g2", "a", 1.0), ("g2", "b", 0.0)],
        "g string, arm string, v double",
    )
    out = {
        r["g"]: r.asDict()
        for r in ab_test(df, ["g"], "arm", "a", "b", F.col("v") > 0.5).collect()
    }
    assert out["g1"]["n_b"] == 0
    assert out["g1"]["rate_b"] is None
    assert out["g1"]["rate_a"] == 0.5
    assert out["g1"]["z"] is None
    assert out["g1"]["significant"] is False
    assert out["g2"]["z"] is not None


def _mmr_cands(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, score double, embedding array<float>"
    )


def test_mmr_demotes_near_duplicate_of_top_hit(spark):
    from cassandra_slow_queries_spark.operators.search import mmr_rerank

    cands = _mmr_cands(
        spark,
        [
            (1, 1.00, [1.0, 0.0]),   # top hit
            (2, 0.95, [1.0, 0.01]),  # near-duplicate of 1: demoted
            (3, 0.60, [0.0, 1.0]),   # orthogonal: promoted to rank 2
        ],
    )
    out = {
        r["mmr_rank"]: r["doc_id"]
        for r in mmr_rerank(cands, k=3, lambda_=0.5).collect()
    }
    assert out == {1: 1, 2: 3, 3: 2}


def test_mmr_lambda_one_is_pure_relevance(spark):
    from cassandra_slow_queries_spark.operators.search import mmr_rerank

    cands = _mmr_cands(
        spark,
        [(i, 1.0 - i / 10.0, [1.0, 0.0]) for i in range(5)],
    )
    out = [
        r["doc_id"]
        for r in mmr_rerank(cands, k=5, lambda_=1.0)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert out == [0, 1, 2, 3, 4]


def test_mmr_first_pick_score_and_tiebreak(spark):
    from cassandra_slow_queries_spark.operators.search import mmr_rerank

    cands = _mmr_cands(
        spark, [(7, 0.8, [1.0, 0.0]), (3, 0.8, [0.0, 1.0])]
    )
    rows = sorted(
        mmr_rerank(cands, k=2, lambda_=0.7).collect(),
        key=lambda r: r["mmr_rank"],
    )
    # equal relevance: smaller id picked first; its score = 0.7*0.8
    assert rows[0]["doc_id"] == 3
    assert rows[0]["mmr_score"] == round(0.7 * 0.8, 6)
    # orthogonal second pick: no diversity penalty
    assert rows[1]["mmr_score"] == round(0.7 * 0.8, 6)


def test_mmr_candidate_guard(spark):
    import pytest

    from cassandra_slow_queries_spark.operators.search import mmr_rerank

    cands = _mmr_cands(
        spark, [(i, 1.0, [1.0, 0.0]) for i in range(30)]
    )
    with pytest.raises(ValueError):
        mmr_rerank(cands, k=5, max_candidates=10)


def test_mmr_string_ids_and_null_scores(spark):
    from cassandra_slow_queries_spark.operators.search import mmr_rerank

    cands = spark.createDataFrame(
        [
            ("a", 0.9, [1.0, 0.0]),
            ("b", None, [1.0, 0.0]),   # unscored: dropped
            ("c", 0.5, [0.0, 1.0]),
        ],
        "doc_id string, score double, embedding array<float>",
    )
    rows = sorted(
        mmr_rerank(cands, k=5).collect(), key=lambda r: r["mmr_rank"]
    )
    assert [r["doc_id"] for r in rows] == ["a", "c"]


def test_mmr_null_ids_dropped(spark):
    """A NULL id is unreturnable AND unorderable in the tie-break
    (None vs int used to TypeError when two objectives tied)."""
    from cassandra_slow_queries_spark.operators.search import mmr_rerank

    cands = spark.createDataFrame(
        [(None, 0.9, [1.0, 0.0]), (2, 0.9, [0.0, 1.0])],
        "doc_id long, score double, embedding array<float>",
    )
    rows = mmr_rerank(cands, k=2).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_mmr_mixed_dims_raise(spark):
    import pytest

    from cassandra_slow_queries_spark.operators.search import mmr_rerank

    cands = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0]), (2, 0.8, [1.0, 0.0, 0.0])],
        "doc_id long, score double, embedding array<float>",
    )
    with pytest.raises(ValueError, match="mixed vector dimensions"):
        mmr_rerank(cands, k=2)


def test_survival_curve_hand_computed(spark):
    """Classic right-censored fixture: durations 1e 2c 3e 4e 5c.
    S(1)=4/5, S(2)=4/5 (censor-only), S(3)=0.8*(2/3), S(4)=...*(1/2),
    S(5) unchanged."""
    from cassandra_slow_queries_spark.operators.analytics import (
        survival_curve,
    )

    df = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (4, True), (5, False)],
        "dur int, event boolean",
    )
    rows = {
        r["dur"]: r
        for r in survival_curve(df, "dur", "event").collect()
    }
    assert rows[1]["n_at_risk"] == 5 and rows[1]["events"] == 1
    assert rows[1]["survival"] == 0.8
    assert rows[2]["censored"] == 1 and rows[2]["survival"] == 0.8
    assert rows[3]["n_at_risk"] == 3
    assert rows[3]["survival"] == round(0.8 * 2 / 3, 6)
    assert rows[4]["survival"] == round(0.8 * 2 / 3 * 0.5, 6)
    assert rows[5]["n_at_risk"] == 1 and rows[5]["survival"] == rows[4][
        "survival"
    ]


def test_survival_curve_extinction_and_nulls(spark):
    """A time where everyone remaining dies drives S to exactly 0.0
    (the -inf log carry), NULL events count as censored, NULL durations
    drop."""
    from cassandra_slow_queries_spark.operators.analytics import (
        survival_curve,
    )

    df = spark.createDataFrame(
        [(1, True), (2, True), (2, True), (None, True), (1, None)],
        "dur int, event boolean",
    )
    rows = {
        r["dur"]: r
        for r in survival_curve(df, "dur", "event").collect()
    }
    assert set(rows) == {1, 2}
    # t=1: n=4 (NULL-dur dropped), d=1 (NULL event = censored)
    assert rows[1]["n_at_risk"] == 4 and rows[1]["events"] == 1
    assert rows[1]["censored"] == 1
    assert rows[1]["survival"] == 0.75
    # t=2: both remaining die -> exact 0.0, not NULL
    assert rows[2]["n_at_risk"] == 2 and rows[2]["events"] == 2
    assert rows[2]["survival"] == 0.0


def test_survival_curve_grouped_independent(spark):
    from cassandra_slow_queries_spark.operators.analytics import (
        survival_curve,
    )

    df = spark.createDataFrame(
        [("a", 1, True), ("a", 2, True), ("b", 1, False), ("b", 3, True)],
        "grp string, dur int, event boolean",
    )
    out = survival_curve(df, "dur", "event", group_cols=["grp"]).collect()
    by = {(r["grp"], r["dur"]): r for r in out}
    assert by[("a", 1)]["survival"] == 0.5
    assert by[("a", 2)]["survival"] == 0.0
    assert by[("b", 1)]["survival"] == 1.0  # censored only
    assert by[("b", 3)]["survival"] == 0.0
    # groups don't see each other's at-risk pools
    assert by[("b", 1)]["n_at_risk"] == 2


# ---------------------------------------------------------------------------
# Poisson bootstrap CI
# ---------------------------------------------------------------------------

from cassandra_slow_queries_spark.operators.analytics import (  # noqa: E402
    POISSON1_CDF,
    poisson_bootstrap_ci,
)


def test_poisson1_cdf_constants_are_the_exact_partial_sums():
    s = 0.0
    for i, c in enumerate(POISSON1_CDF):
        s += math.exp(-1) / math.factorial(i)
        assert s == c  # repr-exact: the oracle SQL interpolates these


def _bs_frame(spark, parts=4):
    rows = [(i, "g" if i % 2 else "h", (i * 37) % 100) for i in range(400)]
    return spark.createDataFrame(
        rows, "event_id long, grp string, v long"
    ).repartition(parts)


def test_bootstrap_ci_brackets_and_orders(spark):
    out = poisson_bootstrap_ci(
        _bs_frame(spark), "v", "event_id", ["grp"], replicates=64
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["ci_lo"] <= r["ci_hi"]
        # with 64 replicates the 2nd..63rd means always bracket a
        # well-behaved sample mean
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
        assert r["n_items"] == 200


def test_bootstrap_ci_partitioning_invariant_bitwise(spark):
    # integral values → exact long replicate sums → the WHOLE output is
    # a pure function of the ids, identical on any partitioning
    a = poisson_bootstrap_ci(
        _bs_frame(spark, parts=1), "v", "event_id", ["grp"]
    ).orderBy("grp").collect()
    b = poisson_bootstrap_ci(
        _bs_frame(spark, parts=7), "v", "event_id", ["grp"]
    ).orderBy("grp").collect()
    assert a == b


def test_bootstrap_ci_constant_data_degenerates_to_the_constant(spark):
    df = spark.createDataFrame(
        [(i, 42) for i in range(200)], "event_id long, v long"
    )
    r = poisson_bootstrap_ci(df, "v", "event_id", replicates=16).collect()[0]
    assert r["mean"] == 42.0 and r["ci_lo"] == 42.0 and r["ci_hi"] == 42.0


def test_bootstrap_ci_salt_changes_resamples_not_mean(spark):
    df = _bs_frame(spark)
    a = poisson_bootstrap_ci(df, "v", "event_id", ["grp"], salt="bs")
    b = poisson_bootstrap_ci(df, "v", "event_id", ["grp"], salt="other")
    ja = {r["grp"]: r for r in a.collect()}
    jb = {r["grp"]: r for r in b.collect()}
    for g in ja:
        assert ja[g]["mean"] == jb[g]["mean"]
        assert (ja[g]["ci_lo"], ja[g]["ci_hi"]) != (
            jb[g]["ci_lo"],
            jb[g]["ci_hi"],
        )


def test_bootstrap_ci_validates_params(spark):
    import pytest as _pt

    df = _bs_frame(spark)
    with _pt.raises(ValueError, match="replicates"):
        poisson_bootstrap_ci(df, "v", "event_id", replicates=2)
    with _pt.raises(ValueError, match="alpha"):
        poisson_bootstrap_ci(df, "v", "event_id", alpha=1.5)


def test_bootstrap_ci_null_values_fully_excluded(spark):
    # a NULL value must not contribute to numerator OR denominator of
    # any replicate: with nulls interleaved the result must equal the
    # same computation on the pre-filtered frame
    rows = [(i, (i * 37) % 100 if i % 3 else None) for i in range(300)]
    df = spark.createDataFrame(rows, "event_id long, v long")
    a = poisson_bootstrap_ci(df, "v", "event_id").collect()[0]
    b = poisson_bootstrap_ci(
        df.filter(F.col("v").isNotNull()), "v", "event_id"
    ).collect()[0]
    assert a == b
