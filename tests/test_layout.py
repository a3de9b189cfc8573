"""Bucketed-layout seam (plans/layout.py): co-located joins must plan
zero exchanges, and the create-once staging must actually create once."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_slow_queries_spark.plans.layout import (
    bucketed_table,
    exchange_count,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_elides_both_exchanges(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    bo = bucketed_table(
        spark, "t_bkt_orders", lambda: orders, ["o_orderkey"], 8, ["o_orderkey"]
    )
    bl = bucketed_table(
        spark,
        "t_bkt_lineitem",
        lambda: lineitem,
        ["l_orderkey"],
        8,
        ["l_orderkey"],
    )
    # merge hint: broadcast would trivially win at this SF and hide the
    # co-location property under a BroadcastExchange
    j = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey).select(
        "o_orderkey", "o_orderpriority", "l_quantity"
    )
    plain = (
        orders.hint("merge")
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select("o_orderkey", "o_orderpriority", "l_quantity")
    )
    assert exchange_count(j) == 0
    assert exchange_count(plain) >= 2  # both sides shuffle without buckets
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "Bucketed: true" in plan
    # same rows either way — layout is a physical property only
    assert j.count() == plain.count()


def test_bucketed_agg_on_bucket_key_elides_exchange(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    bo = bucketed_table(
        spark, "t_bkt_orders", lambda: orders, ["o_orderkey"], 8, ["o_orderkey"]
    )
    agg = bo.groupBy("o_orderkey").agg(F.count("*").alias("n"))
    assert exchange_count(agg) == 0
    # grouping on a NON-bucket key still needs its shuffle
    other = bo.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    assert exchange_count(other) == 1


def test_bucketed_table_creates_once(spark):
    calls = []
    df = spark.range(10).withColumnRenamed("id", "k")

    def build():
        calls.append(1)
        return df

    a = bucketed_table(spark, "t_bkt_once", build, ["k"], 4)
    b = bucketed_table(spark, "t_bkt_once", build, ["k"], 4)
    assert len(calls) == 1
    assert a.count() == b.count() == 10


def test_write_bucketed_mismatched_counts_still_correct(spark):
    """Different bucket counts between the sides: Spark must fall back
    to shuffling (at least one side) but results stay correct — sizing
    is a perf contract, not a correctness one."""
    left = spark.range(100).withColumnRenamed("id", "k")
    right = spark.range(50).withColumnRenamed("id", "k")
    from cassandra_slow_queries_spark.session import scratch_dir

    write_bucketed(left, "t_bkt_8", ["k"], 8, path=scratch_dir("bkt8_"))
    write_bucketed(right, "t_bkt_4", ["k"], 4, path=scratch_dir("bkt4_"))
    j = (
        spark.table("t_bkt_8")
        .hint("merge")
        .join(spark.table("t_bkt_4"), "k")
    )
    assert j.count() == 50


def test_partitioned_write_prunes_directories(spark, tmp_path):
    from cassandra_slow_queries_spark.plans.layout import (
        scan_partition_filters,
        write_partitioned,
    )

    events = spark.read.parquet(f"{SF}/events.parquet")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])
    part = spark.read.parquet(path)
    filtered = part.filter(F.col("event_type") == "click").select(
        "event_id", "value"
    )
    pf = scan_partition_filters(filtered)
    # the equality predicate reaches the scan as a PARTITION filter
    # (directory pruning), not a post-scan data filter
    assert "event_type" in pf and "click" in pf
    # and the layout is a physical property only: same rows as the
    # unpartitioned source
    want = events.filter(F.col("event_type") == "click").count()
    assert filtered.count() == want
    # unfiltered scan has no partition filters
    assert scan_partition_filters(part.select("event_id")) in ("", "[]")


def test_aqe_splits_skewed_join_partition(spark):
    """The session's AQE skew-join handling (session.py) must actually
    engage on a one-key-dominant join: with thresholds scaled down to
    test size, the FINAL adaptive plan marks the sort-merge join
    skew=true (the hot partition was split across tasks) and the result
    is still exactly the unskewed row count."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pad = F.concat(*[F.lit("x" * 32)] * 8).alias("pad")
        left = spark.range(50_000).select(
            (F.col("id") * 0).alias("k"), pad
        ).union(spark.range(1_000).select((F.col("id") % 100 + 1).alias("k"), pad))
        right = spark.range(101).select(
            F.col("id").alias("k"), F.lit("dim").alias("v")
        )
        j = left.hint("merge").join(right, "k")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert len(rows) == 51_000
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_filter_pushdown_and_column_pruning_reach_the_scan(spark):
    """A filtered two-column projection must reach the parquet scan as
    PushedFilters + a pruned ReadSchema — if either regresses, the scan
    reads (and decodes) the full table at 100 TB."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") > 10.0)
    ).select("event_id", "value")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PushedFilters: [" in scan
    for pf in ("EqualTo(event_type,click)", "GreaterThan(value,10.0)"):
        assert pf in scan, scan
    # pruned: only the referenced columns in ReadSchema — not all six
    rs = scan.split("ReadSchema:", 1)[1]
    assert "event_id" in rs and "value" in rs and "event_type" in rs
    for absent in ("user_id", "props", "ts"):
        assert absent not in rs, rs


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_morton(spark):
    from cassandra_slow_queries_spark.plans.layout import zorder_key

    rows = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["z"]
        for r in df.select("id", zorder_key(["x", "y"], bits=8).alias("z")).collect()
    }
    for rid, x, y in rows:
        assert got[rid] == _morton(x, y), (rid, x, y)


def test_zorder_sql_twin_matches_expression(spark):
    import duckdb

    from cassandra_slow_queries_spark.plans.layout import zorder_key_sql

    expr = zorder_key_sql(["x", "y"], bits=8)
    vals = duckdb.sql(
        "SELECT x, y, " + expr + " AS z FROM "
        "(SELECT range % 256 AS x, (range * 31) % 256 AS y FROM range(300))"
    ).fetchall()
    for x, y, z in vals:
        assert z == _morton(x, y)


def test_write_zordered_files_cover_disjoint_z_ranges(spark, tmp_path):
    from cassandra_slow_queries_spark.plans.layout import (
        write_zordered,
        zorder_key,
    )

    df = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("x"),
            ((F.col("id") * 37) % 64).alias("y"),
        )
        .withColumn("z", zorder_key(["x", "y"], bits=6))
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, "z", num_files=8)
    back = spark.read.parquet(out)
    assert back.count() == 4096
    # range-partitioned on z → per-file z-ranges must not overlap
    spans = []
    for f in sorted(set(back.inputFiles())):
        one = spark.read.parquet(f).agg(
            F.min("z").alias("lo"), F.max("z").alias("hi")
        ).collect()[0]
        spans.append((one["lo"], one["hi"]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (spans,)


def test_compact_files_hits_target_and_preserves_rows(spark, tmp_path):
    from cassandra_slow_queries_spark.plans.layout import compact_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.range(1000).repartition(40).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 40
    n = compact_files(spark, src, dst, rows_per_file=300)
    assert n == 4  # ceil(1000/300)
    back = spark.read.parquet(dst)
    assert back.count() == 1000
    assert back.select("id").distinct().count() == 1000


def test_rows_for_target_bytes_scales_with_target(spark, tmp_path):
    from cassandra_slow_queries_spark.plans.layout import rows_for_target_bytes

    src = str(tmp_path / "sized")
    spark.range(10_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).write.parquet(src)
    small = rows_for_target_bytes(spark, src, 10_000)
    big = rows_for_target_bytes(spark, src, 1_000_000)
    assert 0 < small < big


def test_zorder_key_three_dimensions(spark):
    from cassandra_slow_queries_spark.plans.layout import zorder_key

    def morton3(x, y, z, bits=4):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (3 * b)
            out |= ((y >> b) & 1) << (3 * b + 1)
            out |= ((z >> b) & 1) << (3 * b + 2)
        return out

    rows = [(i, i % 16, (i * 3) % 16, (i * 7) % 16) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", zorder_key(["x", "y", "z"], bits=4).alias("m")
        ).collect()
    }
    for rid, x, y, z in rows:
        assert got[rid] == morton3(x, y, z)


def test_runtime_bloom_filter_injected_and_row_identical(spark, tmp_path):
    """Under RUNTIME_BLOOM_CONFS a selective dim ⋈ fact shuffle join
    gains a might_contain probe on the fact scan (rows pruned BEFORE
    the shuffle); rows must equal the unfiltered-plan join. Default
    confs (application threshold 10GB) must NOT inject at test scale —
    the production guardrail the gate floors away."""
    from cassandra_slow_queries_spark.plans.layout import (
        RUNTIME_BLOOM_CONFS,
        conf_scope,
        might_contain_count,
    )

    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).write.parquet(fact_path)
    spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("grp")
    ).write.parquet(dim_path)

    def join():
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).filter(F.col("grp") == 3)
        return fact.join(dim, "k").select("k", "v", "grp")

    with conf_scope(spark, RUNTIME_BLOOM_CONFS):
        probed = join()
        assert might_contain_count(probed) >= 1
        # planning decision must hold while the job runs: collect inside
        got = sorted(tuple(r) for r in probed.collect())
    plain = join()
    assert might_contain_count(plain) == 0
    assert got == sorted(tuple(r) for r in plain.collect())
    assert len(got) > 0


def test_conf_scope_restores_and_unsets(spark):
    key = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    from cassandra_slow_queries_spark.plans.layout import conf_scope

    spark.conf.set(key, "1MB")
    try:
        with conf_scope(spark, {key: "99MB"}):
            assert spark.conf.get(key) == "99MB"
        assert spark.conf.get(key) == "1MB"
    finally:
        spark.conf.unset(key)
    before = spark.conf.get(key, None)  # built-in default (unset)
    with conf_scope(spark, {key: "42MB"}):
        assert spark.conf.get(key) == "42MB"
    assert spark.conf.get(key, None) == before
