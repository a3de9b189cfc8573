"""merge_upsert / assign_global_ids (operators/merge.py) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.merge import (
    assign_global_ids,
    merge_upsert,
)

SNAP_SCHEMA = "k string, v long, payload string"
CHG_SCHEMA = "k string, v long, payload string, dead boolean"


def _merge(spark, snap_rows, chg_rows, **kw):
    snap = spark.createDataFrame(snap_rows, SNAP_SCHEMA)
    chg = spark.createDataFrame(chg_rows, CHG_SCHEMA)
    out = merge_upsert(
        snap, chg, keys=["k"], version_cols=["v"], tombstone_col="dead", **kw
    )
    return {r["k"]: (r["v"], r["payload"]) for r in out.collect()}


def test_latest_version_wins_across_sides(spark):
    got = _merge(
        spark,
        [("a", 2, "snap"), ("b", 5, "snap")],
        [("a", 3, "chg", False), ("b", 1, "late", False)],
    )
    # a: change v3 beats snapshot v2; b: late change v1 loses to snapshot v5
    assert got == {"a": (3, "chg"), "b": (5, "snap")}


def test_equal_version_change_wins(spark):
    got = _merge(spark, [("a", 2, "snap")], [("a", 2, "redelivered", False)])
    assert got == {"a": (2, "redelivered")}


def test_tombstone_deletes_and_higher_version_resurrects(spark):
    got = _merge(
        spark,
        [("gone", 1, "snap"), ("back", 1, "snap")],
        [
            ("gone", 2, "x", True),
            ("back", 2, "x", True),
            ("back", 3, "reborn", False),
            ("new", 1, "fresh", False),
        ],
    )
    # 'gone' deleted by the winning tombstone; 'back' resurrected by v3;
    # 'new' inserted with no snapshot row
    assert got == {"back": (3, "reborn"), "new": (1, "fresh")}


def test_old_tombstone_cannot_delete_newer_row(spark):
    got = _merge(spark, [("a", 5, "snap")], [("a", 3, "x", True)])
    assert got == {"a": (5, "snap")}


def test_output_schema_is_snapshot_schema(spark):
    snap = spark.createDataFrame([("a", 1, "p")], SNAP_SCHEMA)
    chg = spark.createDataFrame([("a", 2, "q", False)], CHG_SCHEMA)
    out = merge_upsert(snap, chg, ["k"], ["v"], tombstone_col="dead")
    assert out.columns == snap.columns


def test_missing_tombstone_column_raises(spark):
    snap = spark.createDataFrame([("a", 1, "p")], SNAP_SCHEMA)
    chg = spark.createDataFrame([("a", 2, "q")], SNAP_SCHEMA)
    import pytest

    with pytest.raises(ValueError, match="tombstone"):
        merge_upsert(snap, chg, ["k"], ["v"], tombstone_col="dead")


def test_merge_without_tombstones(spark):
    snap = spark.createDataFrame([("a", 1, "p")], SNAP_SCHEMA)
    chg = spark.createDataFrame([("a", 2, "q"), ("b", 1, "r")], SNAP_SCHEMA)
    out = merge_upsert(snap, chg, ["k"], ["v"])
    got = {r["k"]: r["payload"] for r in out.collect()}
    assert got == {"a": "q", "b": "r"}


def test_global_ids_match_row_number(spark):
    rows = [(i, (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score long")
    out = assign_global_ids(
        df, [F.col("score").desc(), F.col("id").asc()], num_ranges=7
    )
    got = {r["id"]: r["global_id"] for r in out.collect()}
    expected_order = sorted(rows, key=lambda r: (-r[1], r[0]))
    for rank, (rid, _score) in enumerate(expected_order, start=1):
        assert got[rid] == rank
    # contiguous 1..N exactly once
    assert sorted(got.values()) == list(range(1, 201))


def test_global_ids_more_ranges_than_rows(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    out = assign_global_ids(df, [F.col("id").asc()], num_ranges=16)
    got = {r["id"]: r["global_id"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_scd2_intervals_chain_per_key(spark):
    from cassandra_slow_queries_spark.operators.merge import scd2_history

    rows = [
        ("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
        ("b", 4, 15),
    ]
    df = spark.createDataFrame(rows, "k string, change_id long, v long")
    hist = scd2_history(df, keys=["k"], version_cols=["v", "change_id"])
    got = {
        r["change_id"]: (r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    }
    assert got == {
        1: (10, 20, False),
        2: (20, 30, False),
        3: (30, None, True),
        4: (15, None, True),
    }


def test_scd2_tiebreak_orders_equal_versions(spark):
    from cassandra_slow_queries_spark.operators.merge import scd2_history

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 10)], "k string, change_id long, v long"
    )
    hist = scd2_history(df, keys=["k"], version_cols=["v", "change_id"])
    got = {r["change_id"]: r["is_current"] for r in hist.collect()}
    # change_id tiebreak: id=2 is the later change, hence current
    assert got == {1: False, 2: True}


def test_overwrite_partitions_touches_only_present_partitions(spark, tmp_path):
    from cassandra_slow_queries_spark.plans.layout import overwrite_partitions

    root = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [("d1", 1, 100), ("d1", 2, 200), ("d2", 3, 300)],
        "day string, id long, v long",
    )
    base.write.partitionBy("day").parquet(root)
    d2_files_before = {
        f for f in spark.read.parquet(root).inputFiles() if "day=d2" in f
    }
    restated = spark.createDataFrame([("d1", 9, 999)], "day string, id long, v long")
    overwrite_partitions(restated, root, ["day"])
    back = spark.read.parquet(root)
    d2_files_after = {f for f in back.inputFiles() if "day=d2" in f}
    assert d2_files_before == d2_files_after  # untouched partition
    got = {(r["day"], r["id"], r["v"]) for r in back.collect()}
    assert got == {("d1", 9, 999), ("d2", 3, 300)}  # d1 fully replaced


def test_merge_agg_snapshots_equals_full_recompute(spark):
    from cassandra_slow_queries_spark.operators.merge import merge_agg_snapshots

    rows = [(f"k{i % 3}", i, i * 7 % 50) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, seq long, v long")

    def cells(d):
        return d.groupBy("k").agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )

    merged = merge_agg_snapshots(
        cells(df.filter("seq < 60")),
        cells(df.filter("seq >= 60")),
        keys=["k"],
        sum_cols=["cnt", "total"],
        min_cols=["lo"],
        max_cols=["hi"],
    )
    want = {r["k"]: r.asDict() for r in cells(df).collect()}
    got = {r["k"]: r.asDict() for r in merged.collect()}
    assert got == want


def test_merge_agg_snapshots_key_only_on_one_side(spark):
    from cassandra_slow_queries_spark.operators.merge import merge_agg_snapshots

    snap = spark.createDataFrame([("a", 2, 10)], "k string, cnt long, total long")
    delta = spark.createDataFrame([("b", 1, 5)], "k string, cnt long, total long")
    got = {
        r["k"]: (r["cnt"], r["total"])
        for r in merge_agg_snapshots(
            snap, delta, ["k"], sum_cols=["cnt", "total"]
        ).collect()
    }
    assert got == {"a": (2, 10), "b": (1, 5)}


def test_merge_agg_snapshots_requires_measures(spark):
    import pytest

    from cassandra_slow_queries_spark.operators.merge import merge_agg_snapshots

    df = spark.createDataFrame([("a", 1)], "k string, cnt long")
    with pytest.raises(ValueError, match="measure"):
        merge_agg_snapshots(df, df, ["k"])


def test_merge_upsert_plans_as_partial_agg_not_window(spark):
    """The scale property: latest-wins compiles to a hash aggregation
    with map-side partial combine (hot keys collapse before the
    shuffle), not a sort+window (whole hot key in one task)."""
    from cassandra_slow_queries_spark.operators.merge import merge_upsert
    from cassandra_slow_queries_spark.plans.layout import exchange_count

    snap = spark.createDataFrame([("a", 1, "p")], SNAP_SCHEMA)
    chg = spark.createDataFrame([("a", 2, "q", False)], CHG_SCHEMA)
    out = merge_upsert(snap, chg, ["k"], ["v"], tombstone_col="dead")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan or "partial" in plan.lower()
    assert exchange_count(out) == 1


def test_corpus_diff_classifies_all_statuses(spark):
    from cassandra_slow_queries_spark.operators.merge import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c-edited"), (4, "d")], "id long, text string"
    )
    got = {
        r["id"]: r["status"]
        for r in corpus_diff(old, new, "id", ["text"]).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_pit_join_picks_version_in_effect(spark):
    from cassandra_slow_queries_spark.operators.merge import (
        pit_join,
        scd2_history,
    )

    changes = spark.createDataFrame(
        [
            (1, 100, 1, "bronze"),
            (1, 200, 2, "silver"),
            (1, 300, 3, "gold"),
            (2, 150, 4, "bronze"),
        ],
        "user long, ts long, cid long, plan string",
    )
    history = scd2_history(changes, ["user"], ["ts", "cid"])
    facts = spark.createDataFrame(
        [
            (10, 1, 50),    # before first version -> NULL
            (11, 1, 100),   # exactly at valid_from -> inclusive match
            (12, 1, 250),   # between silver and gold -> silver
            (13, 1, 999),   # after last -> current version
            (14, 2, 160),
            (15, 3, 500),   # key with no history -> NULL
        ],
        "fid long, user long, ts long",
    )
    out = {
        r.fid: (r.pit_plan, r.pit_ts)
        for r in pit_join(
            facts, history, ["user"], value_cols=["plan"]
        ).collect()
    }
    assert out[10] == (None, None)
    assert out[11] == ("bronze", 100)
    assert out[12] == ("silver", 200)
    assert out[13] == ("gold", 300)
    assert out[14] == ("bronze", 150)
    assert out[15] == (None, None)


def test_corpus_diff_null_swap_is_changed(spark):
    # xxhash64 SKIPS null args: without per-column null sentinels,
    # ('x', NULL) and (NULL, 'x') hash identically and a changed row
    # silently classifies as unchanged
    from cassandra_slow_queries_spark.operators.merge import corpus_diff

    old = spark.createDataFrame(
        [(1, "x", None), (2, "a", "b")], "id long, t string, b string"
    )
    new = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b")], "id long, t string, b string"
    )
    got = {
        r["id"]: r["status"]
        for r in corpus_diff(old, new, "id", ["t", "b"]).collect()
    }
    assert got == {1: "changed", 2: "unchanged"}


def test_assign_global_ids_ties_stay_unique(spark):
    # the default RANGE window frame aggregates order-tie peers
    # together: order [5,5,7] minted ids [2,2,3] — duplicates — before
    # the ROWS-frame fix
    from cassandra_slow_queries_spark.operators.merge import (
        assign_global_ids,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([5, 5, 7, 5, 7, 1])],
        "row long, v long",
    )
    out = assign_global_ids(df, [F.col("v")], num_ranges=3).collect()
    ids = sorted(r["global_id"] for r in out)
    assert ids == [1, 2, 3, 4, 5, 6]  # contiguous, no duplicates
    by_v = {}
    for r in out:
        by_v.setdefault(r["v"], []).append(r["global_id"])
    assert sorted(by_v[1]) == [1]
    assert sorted(by_v[5]) == [2, 3, 4]  # ties: arbitrary but unique
    assert sorted(by_v[7]) == [5, 6]


def test_pit_join_excludes_renamed_interval_metadata(spark):
    # scd2_history lets callers rename valid_to/is_current; pit_join
    # must exclude THOSE names or the version's end time leaks as a
    # pit_ feature — the exact future-leak the operator exists to stop
    from cassandra_slow_queries_spark.operators.merge import (
        pit_join,
        scd2_history,
    )

    changes = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", "basic"),
         (1, "2026-06-01 00:00:00", "pro")],
        "user long, ts string, plan string",
    ).select("user", F.to_timestamp("ts").alias("ts"), "plan")
    hist = scd2_history(
        changes, ["user"], ["ts"], to_col="end_ts", current_col="current"
    ).drop("ts")
    facts = spark.createDataFrame(
        [(1, "2026-03-01 00:00:00")], "user long, ts string"
    ).select("user", F.to_timestamp("ts").alias("ts"))
    out = pit_join(
        facts, hist, ["user"], to_col="end_ts", current_col="current"
    )
    leaked = [c for c in out.columns if "end_ts" in c or "current" in c]
    assert leaked == [], out.columns
    assert out.collect()[0]["pit_plan"] == "basic"
