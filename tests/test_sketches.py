"""Count-min sketch invariants (operators/sketches.py).

The CM contract is asymmetric and exactly testable: estimates NEVER
undercount (collisions only add), overcount is bounded by ε·N at the
chosen width, the sketch is deterministic for a fixed seed, and merging
per-shard sketches equals the whole-stream sketch cell-for-cell. All
four are pinned on the real events table plus an adversarial skewed
stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.sketches import (
    cm_build,
    cm_merge,
    cm_query,
)

SF = "/root/testdata/sf0.001"
W, D = 2048, 5


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _exact(df, col):
    return {
        r[col]: r["n"]
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_never_undercounts_and_bounded_overcount(spark, events):
    sketch = cm_build(events, "event_type", width=W, depth=D)
    probes = events.select("event_type").distinct()
    est = {
        r["event_type"]: r["cm_count"]
        for r in cm_query(sketch, probes, "event_type", width=W, depth=D).collect()
    }
    exact = _exact(events, "event_type")
    n = sum(exact.values())
    eps_n = (2.718281828 / W) * n  # the classic e/width bound
    for k, true in exact.items():
        assert est[k] >= true, f"{k}: CM undercounted {est[k]} < {true}"
        assert est[k] <= true + eps_n + 1e-9
    # a handful of distinct items in a 2048-wide table: no collisions,
    # so the estimates are exactly the counts
    assert est == exact


def test_unseen_item_estimates_zero_or_collision_only(spark, events):
    sketch = cm_build(events, "event_type", width=W, depth=D)
    probes = spark.createDataFrame(
        [("never-seen-item-xyz",)], "event_type string"
    )
    est = cm_query(sketch, probes, "event_type", width=W, depth=D).first()[
        "cm_count"
    ]
    assert est >= 0  # >= true(=0); with 5 levels a collision on ALL
    assert est == 0  # levels at width 2048 over ~5 items cannot happen


def test_merge_equals_whole_stream(spark, events):
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = cm_merge(
        cm_build(a, "event_type", width=W, depth=D),
        cm_build(b, "event_type", width=W, depth=D),
    )
    whole = cm_build(events, "event_type", width=W, depth=D)
    m = {(r["j"], r["col"]): r["cnt"] for r in merged.collect()}
    w = {(r["j"], r["col"]): r["cnt"] for r in whole.collect()}
    assert m == w  # cell-for-cell, not just query-equivalent


def test_deterministic_across_partitionings(spark, events):
    s1 = cm_build(events.repartition(1), "event_type", width=W, depth=D)
    s2 = cm_build(events.repartition(13), "event_type", width=W, depth=D)
    assert {tuple(r) for r in s1.collect()} == {tuple(r) for r in s2.collect()}


def test_skewed_stream_heavy_hitter_accuracy(spark):
    # 90% of rows one key + 200 tail keys: the CM use case. The heavy
    # hitter must be exact-ish; tail estimates stay within the bound.
    rows = [(i, "hot" if i % 10 else f"k{i % 200}") for i in range(5000)]
    df = spark.createDataFrame(rows, "i long, k string")
    sketch = cm_build(df, "k", width=W, depth=D)
    exact = _exact(df, "k")
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["cm_count"]
        for r in cm_query(sketch, probes, "k", width=W, depth=D).collect()
    }
    n = len(rows)
    for k, true in exact.items():
        assert est[k] >= true
        assert est[k] <= true + (2.718281828 / W) * n + 1e-9


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 4), ("b", 5)], "k string, w int"
    )
    sketch = cm_build(df, "k", width=64, depth=3, weight_col="w")
    est = {
        r["k"]: r["cm_count"]
        for r in cm_query(
            sketch, df.select("k").distinct(), "k", width=64, depth=3
        ).collect()
    }
    assert est["a"] >= 7 and est["b"] >= 5


def test_validation(spark, events):
    with pytest.raises(ValueError):
        cm_build(events, "event_type", width=0)
    with pytest.raises(ValueError):
        cm_merge()


def test_null_probe_estimates_null(spark, events):
    # xxhash64 IGNORES null inputs, so an unguarded NULL probe would
    # hash as xxhash64(j, seed) and read an accidental cell (r9 ADVICE)
    sketch = cm_build(events, "event_type", width=W, depth=D)
    real = events.first()["event_type"]
    probes = spark.createDataFrame(
        [("x", real), ("y", None)], "tag string, event_type string"
    )
    rows = {
        r["tag"]: r["cm_count"]
        for r in cm_query(sketch, probes, "event_type", width=W, depth=D).collect()
    }
    assert rows["y"] is None
    assert rows["x"] is not None and rows["x"] > 0


def test_duplicate_probe_rows_preserved(spark, events):
    sketch = cm_build(events, "event_type", width=W, depth=D)
    real = events.first()["event_type"]
    probes = spark.createDataFrame(
        [(real,), (real,), (real,)], "event_type string"
    )
    out = cm_query(sketch, probes, "event_type", width=W, depth=D).collect()
    assert len(out) == 3
    assert len({r["cm_count"] for r in out}) == 1


def test_probe_columns_named_j_col_cnt_do_not_collide(spark, events):
    sketch = cm_build(events, "event_type", width=W, depth=D)
    real = events.first()["event_type"]
    probes = spark.createDataFrame(
        [(real, 1, 2, 3)],
        "event_type string, j int, col int, cnt int",
    )
    row = cm_query(sketch, probes, "event_type", width=W, depth=D).first()
    assert (row["j"], row["col"], row["cnt"]) == (1, 2, 3)
    assert row["cm_count"] > 0


def test_streaming_build_matches_batch(spark, events, tmp_path):
    """cm_build is ONE hash aggregation, so under Structured Streaming
    (complete mode) the cell frame after the last micro-batch must
    equal the batch sketch cell-for-cell — the ingest-time deployment
    shape: sketch arriving events without a rescan, exactly like the
    HLL rollup. Two micro-batches prove cross-batch state merge."""
    src = str(tmp_path / "src")
    half_a = events.filter("event_id % 2 = 0").select("event_type")
    half_b = events.filter("event_id % 2 = 1").select("event_type")
    half_a.write.mode("append").parquet(src)
    half_b.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cm_build(stream, "event_type", width=W, depth=D)
        .writeStream.format("memory")
        .queryName("cm_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["j"], r["col"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cm_stream").collect()
    }
    batch = {
        (r["j"], r["col"]): r["cnt"]
        for r in cm_build(events, "event_type", width=W, depth=D).collect()
    }
    assert streamed == batch


# --- property-based invariants (hypothesis) -------------------------------
# One Spark job per example is seconds, so examples stay tiny — the value
# is randomized stream STRUCTURE (dup patterns, weights, widths), not
# volume; the deterministic tests above cover scale shapes.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_stream = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee", "f0", "g1", "h2"]),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=_stream, width=st.sampled_from([4, 16, 256]))
def test_prop_never_undercounts_any_stream(spark, items, width):
    from collections import Counter

    df = spark.createDataFrame([(x,) for x in items], "k string")
    sketch = cm_build(df, "k", width=width, depth=3)
    est = {
        r["k"]: r["cm_count"]
        for r in cm_query(
            sketch, df.select("k").distinct(), "k", width=width, depth=3
        ).collect()
    }
    true = Counter(items)
    for k, n in true.items():
        assert est[k] >= n  # theorem: collisions only add
        assert est[k] <= len(items)  # cannot exceed total mass


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=_stream, cut=st.integers(min_value=0, max_value=40))
def test_prop_merge_equals_whole_for_any_split(spark, items, cut):
    cut = min(cut, len(items))
    a, b = items[:cut], items[cut:]
    whole = cm_build(
        spark.createDataFrame([(x,) for x in items], "k string"), "k",
        width=16, depth=3,
    )
    parts = [
        cm_build(spark.createDataFrame([(x,) for x in part], "k string"),
                 "k", width=16, depth=3)
        for part in (a, b) if part
    ]
    merged = cm_merge(*parts) if parts else None
    w = {(r["j"], r["col"]): r["cnt"] for r in whole.collect()}
    m = {(r["j"], r["col"]): r["cnt"] for r in merged.collect()}
    assert w == m  # cell-exact for ANY split point


def test_empty_stream_and_empty_probe_edges(spark, events):
    # empty stream -> empty cell frame; probes against it estimate 0
    empty = cm_build(events.filter("1=0"), "event_type", width=W, depth=D)
    assert empty.count() == 0
    real = events.first()["event_type"]
    probes = spark.createDataFrame([(real,)], "event_type string")
    est = cm_query(empty, probes, "event_type", width=W, depth=D).first()["cm_count"]
    assert est == 0  # >= true(=0), never NULL for a non-null probe
    # empty probe frame -> empty result, no error
    sketch = cm_build(events, "event_type", width=W, depth=D)
    out = cm_query(sketch, probes.filter("1=0"), "event_type", width=W, depth=D)
    assert out.count() == 0


# --- Misra-Gries heavy-hitter summaries (the dual sketch) -----------------

from cassandra_slow_queries_spark.operators.sketches import (
    mg_partition_summaries,
    mg_topk_candidates,
)


def test_mg_never_overcounts_and_bounded_undercount(spark, events):
    from pyspark.sql import functions as F2

    exact = _exact(events, "event_type")
    n = sum(exact.values())
    k = 8
    cands = {
        r["event_type"]: r["mg_count"]
        for r in mg_topk_candidates(events, "event_type", k=k).collect()
    }
    for it, est in cands.items():
        assert est <= exact[it], f"{it}: MG overcounted {est} > {exact[it]}"
        assert exact[it] - est <= n / (k + 1) + 1e-9
    # completeness: every item above the threshold must appear
    for it, true in exact.items():
        if true > n / (k + 1):
            assert it in cands and cands[it] > 0


def test_mg_summary_size_bounded_per_partition(spark):
    rows = [(i, f"k{i % 500}") for i in range(20000)]
    df = spark.createDataFrame(rows, "i long, k string").repartition(4)
    summ = mg_partition_summaries(df, "k", k=16)
    # <= k rows per partition -> <= 4*k total, despite 500 distinct items
    assert summ.count() <= 4 * 16


def test_mg_guarantees_hold_under_any_partitioning(spark):
    from collections import Counter

    rows = [(i, "hot" if i % 5 else f"t{i % 97}") for i in range(10000)]
    true = Counter(k for _, k in rows)
    n = len(rows)
    k = 24
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "i long, key string").repartition(parts)
        cands = {
            r["key"]: r["mg_count"]
            for r in mg_topk_candidates(df, "key", k=k).collect()
        }
        for it, est in cands.items():
            assert est <= true[it]
            assert true[it] - est <= n / (k + 1) + 1e-9
        assert "hot" in cands  # 8000 occurrences >> n/(k+1)=400
        assert cands["hot"] >= true["hot"] - n / (k + 1)


def test_mg_weighted_and_null_items(spark):
    df = spark.createDataFrame(
        [("a", 30), ("b", 3), (None, 99), ("a", 10)], "k string, w int"
    )
    cands = {
        r["k"]: r["mg_count"]
        for r in mg_topk_candidates(df, "k", k=1, weight_col="w").collect()
    }
    assert None not in cands
    assert cands.get("a", 0) <= 40 and cands.get("a", 0) >= 40 - 43 / 2
    with pytest.raises(ValueError):
        mg_partition_summaries(df, "k", k=0)


def test_mg_null_weights_skipped_like_cm_build(spark):
    # Spark long nulls arrive in pandas as NaN — a null WEIGHT must be
    # skipped (matching cm_build's F.sum semantics), not poison the
    # group sum into NaN and crash int() in the executor
    df = spark.createDataFrame(
        [("a", 5), ("a", None), ("b", 2), (None, None)],
        "k string, w int",
    ).repartition(2)
    cands = {
        r["k"]: r["mg_count"]
        for r in mg_topk_candidates(df, "k", k=8, weight_col="w").collect()
    }
    assert cands == {"a": 5, "b": 2}


def test_mg_precomputed_summaries_match_default_path(spark):
    # r13 opt: a caller that also needs the summary frame builds it
    # once and passes it in — the merge must be identical to the
    # default (internally-built) path, row for row
    rows = [(i, "hot" if i % 3 else f"t{i % 41}") for i in range(5000)]
    df = spark.createDataFrame(rows, "i long, k string").repartition(5)
    summ = mg_partition_summaries(df, "k", k=8)
    via_summ = {
        r["k"]: r["mg_count"]
        for r in mg_topk_candidates(df, "k", k=8, summaries=summ).collect()
    }
    default = {
        r["k"]: r["mg_count"]
        for r in mg_topk_candidates(df, "k", k=8).collect()
    }
    assert via_summ == default


# --- Bloom filter (membership / semi-join pushdown) ------------------------

from cassandra_slow_queries_spark.operators.sketches import (
    bloom_build,
    bloom_might_contain,
)


def test_bloom_zero_false_negatives_and_fpr(spark):
    members = spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("k"))
    bf = bloom_build(members, "k")
    assert bf.m >= 16 * 2000 and bf.m & (bf.m - 1) == 0  # pow2 sizing
    assert bf.n_keys == 2000 and bf.key_type == "bigint"
    probe = bloom_might_contain(bf, F.col("k"))
    # theorem: every member probes TRUE, on any partitioning
    assert (
        members.repartition(7).select(probe.alias("hit"))
        .filter(~F.col("hit")).count() == 0
    )
    # non-members (disjoint key space): FPR near the analytic ~0.1%
    non = spark.range(0, 20000).select((F.col("id") * 7 + 4).alias("k"))
    fp = non.select(probe.alias("hit")).filter(F.col("hit")).count()
    assert fp <= 0.004 * 20000 + 10  # 4x the (1-e^{-6/16})^6 bound + slack


def test_bloom_pruned_join_equals_exact_join(spark):
    dim = spark.range(0, 500).select((F.col("id") * 3).alias("key"))
    fact = spark.range(0, 30000).select(
        (F.col("id") % 2000).alias("key"), F.col("id").alias("v")
    )
    bf = bloom_build(dim, "key")
    pruned = fact.filter(bloom_might_contain(bf, F.col("key")))
    exact = fact.join(dim, "key").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    via_bloom = pruned.join(dim, "key").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert (exact["n"], exact["s"]) == (via_bloom["n"], via_bloom["s"])
    # and the prune actually prunes: survivors <= matches + FPR slack
    matches = fact.join(dim, "key", "left_semi").count()
    assert matches <= pruned.count() <= matches + 0.004 * 30000 + 10


def test_bloom_null_and_empty_contracts(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "k bigint")
    bf = bloom_build(df, "k")
    hits = dict(
        df.select("k", bloom_might_contain(bf, F.col("k")).alias("h")).collect()
    )
    assert hits[1] is True and hits[2] is True and hits[None] is None
    with pytest.raises(ValueError, match="no non-null keys"):
        bloom_build(df.filter("k IS NULL"), "k")
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_hashes=0)
    with pytest.raises(ValueError):
        bloom_build(df, "k", bits_per_key=0)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    bits=st.sampled_from([8, 16, 32]),
    k=st.sampled_from([2, 6]),
)
def test_prop_bloom_never_false_negative(spark, keys, bits, k):
    # THE theorem: any member key set, any sizing, any partitioning —
    # every member probes TRUE
    df = spark.createDataFrame([(x,) for x in keys], "key bigint")
    bf = bloom_build(df, "key", bits_per_key=bits, n_hashes=k)
    misses = (
        df.repartition(3)
        .select(bloom_might_contain(bf, F.col("key")).alias("h"))
        .filter(~F.col("h"))
        .count()
    )
    assert misses == 0


def test_bloom_probe_type_mismatch_is_cast_safe(spark):
    # xxhash64 is type-sensitive: an int32 probe against an int64-built
    # filter hashes differently UNLESS the probe is cast to the build
    # type — bloom_might_contain must do that cast, or members vanish
    members = spark.range(0, 500).select(F.col("id").alias("k"))  # bigint
    bf = bloom_build(members, "k")
    as_int32 = members.select(F.col("k").cast("int").alias("k"))
    misses = (
        as_int32.select(bloom_might_contain(bf, F.col("k")).alias("h"))
        .filter(~F.col("h"))
        .count()
    )
    assert misses == 0
    # a probe the build type cannot represent prunes as NULL, not FALSE
    r = spark.range(1).select(
        bloom_might_contain(bf, F.lit("not-a-number")).alias("h")
    ).collect()[0]["h"]
    assert r is None


def test_cm_probe_type_mismatch_still_never_undercounts(spark):
    # xxhash64 is type-sensitive; the string canonicalization must make
    # an int32 probe against a bigint-built sketch hit the same cells
    df = spark.range(0, 2000).select((F.col("id") % 40).alias("k"))  # bigint
    sketch = cm_build(df, "k", width=64, depth=3)
    probes32 = df.select(F.col("k").cast("int").alias("k")).distinct()
    est = {
        r["k"]: r["cm_count"]
        for r in cm_query(sketch, probes32, "k", width=64, depth=3).collect()
    }
    assert all(v >= 50 for v in est.values()), est  # true count per key


# ---------------------------------------------------------------------------
# q-digest
# ---------------------------------------------------------------------------

from cassandra_slow_queries_spark.operators.sketches import (  # noqa: E402
    qd_build,
    qd_merge,
    qd_partition_digests,
    qd_quantiles,
    qd_rank_bounds,
)

_QD_L = 20
_QD_DOMAIN = 1 << _QD_L


def _qd_corpus(spark, seed=7, n_low=4000, n_high=400):
    """Deterministic mixed corpus: a dense low band plus a sparse high
    tail so compression genuinely fires at small k."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vals = (
        list(rng.integers(0, 600, n_low))
        + list(rng.integers(100_000, _QD_DOMAIN, n_high))
        + [0, _QD_DOMAIN - 1]
    )
    df = spark.createDataFrame(
        [(int(v),) for v in vals], "v long"
    ).repartition(8)
    return df, [int(v) for v in vals]


def _qd_assert_sandwich(digest, vals, probes, spark, p_bound=8, k=32):
    b = (
        qd_rank_bounds(
            digest,
            spark.createDataFrame([(int(p),) for p in probes], "probe long"),
            _QD_L,
        )
        .toPandas()
        .set_index("probe")
    )
    n = len(vals)
    bound = _QD_L * (2 * n / k + p_bound + 1)
    for p, row in b.iterrows():
        exact = sum(1 for v in vals if v < p)
        assert row["rank_lo"] <= exact <= row["rank_lo"] + row["anc"], (
            p,
            row["rank_lo"],
            exact,
            row["anc"],
        )
        assert row["anc"] < bound, (p, row["anc"], bound)


def test_qd_mass_size_and_rank_sandwich(spark):
    df, vals = _qd_corpus(spark)
    k = 32
    digest = qd_build(df, "v", k=k, level_bits=_QD_L)
    rows = digest.collect()
    assert sum(r["cnt"] for r in rows) == len(vals)  # mass, exactly
    assert len(rows) <= 8 * k + 1  # size theorem (n >= 2k here)
    probes = [0, 1, 64, 300, 600, 5000, 200_000, _QD_DOMAIN - 1]
    _qd_assert_sandwich(digest, vals, probes, spark, k=k)


def test_qd_compression_actually_fires(spark):
    # with ~4400 distinct-ish leaves and k=32 the digest MUST be far
    # smaller than the leaf histogram — a no-op compress fails here
    df, vals = _qd_corpus(spark)
    digest = qd_build(df, "v", k=32, level_bits=_QD_L)
    n_distinct = len(set(vals))
    assert digest.count() <= 8 * 32 + 1 < n_distinct


def test_qd_merge_of_split_builds_keeps_theorems(spark):
    df, vals = _qd_corpus(spark)
    k = 32
    evens = df.filter(F.pmod(F.col("v"), F.lit(2)) == 0).repartition(4)
    odds = df.filter(F.pmod(F.col("v"), F.lit(2)) == 1).repartition(4)
    merged = qd_merge(
        qd_partition_digests(evens, "v", k, _QD_L).unionByName(
            qd_partition_digests(odds, "v", k, _QD_L)
        ),
        k,
        _QD_L,
    )
    assert sum(r["cnt"] for r in merged.collect()) == len(vals)
    _qd_assert_sandwich(
        merged, vals, [0, 300, 5000, _QD_DOMAIN - 1], spark, k=k
    )


def test_qd_partitioning_invariant_bounds(spark):
    df, vals = _qd_corpus(spark)
    for parts in (1, 7):
        digest = qd_build(df.repartition(parts), "v", k=32, level_bits=_QD_L)
        _qd_assert_sandwich(
            digest, vals, [1, 600, 200_000], spark, p_bound=parts, k=32
        )


def test_qd_quantile_straddle_gates(spark):
    df, vals = _qd_corpus(spark)
    k, p = 64, 8
    digest = qd_build(df, "v", k=k, level_bits=_QD_L)
    out = qd_quantiles(digest, [0.1, 0.25, 0.5, 0.75, 0.9], _QD_L).collect()
    assert len(out) == 5
    n = len(vals)
    bound = _QD_L * (2 * n / k + p + 1)
    for r in out:
        v, r_star = r["value"], r["r_star"]
        le = sum(1 for x in vals if x <= v)
        lt = sum(1 for x in vals if x < v)
        assert le >= r_star  # G1: the answer covers the target rank
        assert lt < r_star + bound  # G2: and overshoots at most the bound


def test_qd_nulls_skipped_and_domain_contract(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (5,), (None,), (5,)], "v long"
    )
    digest = qd_build(df, "v", k=8, level_bits=_QD_L)
    assert sum(r["cnt"] for r in digest.collect()) == 3  # nulls skipped
    import pytest as _pt

    bad = spark.createDataFrame([(_QD_DOMAIN,)], "v long")
    with _pt.raises(Exception, match="outside"):
        qd_build(bad, "v", k=8, level_bits=_QD_L).collect()
    neg = spark.createDataFrame([(-1,)], "v long")
    with _pt.raises(Exception, match="outside"):
        qd_build(neg, "v", k=8, level_bits=_QD_L).collect()


def test_qd_validates_params(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="k must be"):
        qd_partition_digests(df, "v", k=0)
    with pytest.raises(ValueError, match="level_bits"):
        qd_partition_digests(df, "v", k=8, level_bits=0)
