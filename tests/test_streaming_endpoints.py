"""Tier-2 streaming equivalence (SURVEY.md §5.5) + J5 endpoint enrichment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.endpoints import (
    attach_endpoints,
    endpoints_report,
    fake_endpoints,
)
from cassandra_slow_queries_spark.streaming.pipeline import (
    read_fact_stream,
    run_stream_to_batch,
    run_volume_top_stream,
    volume_stream,
)


@pytest.fixture(scope="module")
def fact_dir(spark, tmp_path_factory):
    rows = []
    for minute in range(3):
        for i in range(4):
            rows.append(
                (f"2026-08-13 05:0{minute}:{10 + i}", f"q{i % 2}", str(i), 100 + i)
            )
    df = spark.createDataFrame(
        rows, "ts_s string, query string, primary_key string, duration long"
    ).select(F.to_timestamp("ts_s").alias("ts"), "query", "primary_key", "duration")
    out = str(tmp_path_factory.mktemp("facts"))
    df.write.mode("overwrite").parquet(out)
    return out


def test_stream_volume_equals_batch(spark, fact_dir):
    stream = read_fact_stream(spark, fact_dir)
    got = run_stream_to_batch(volume_stream(stream)).collect()
    batch = spark.read.parquet(fact_dir)
    expected = (
        batch.groupBy(
            F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm").alias(
                "minute"
            )
        )
        .agg(F.count("*").alias("cnt"), F.sum("duration").alias("duration"))
        .withColumn(
            "avg_duration",
            F.floor(F.col("duration") / F.col("cnt")).cast("long"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    assert all(r.avg_duration == 101 for r in got)  # (100+101+102+103)/4 floor


def test_stream_volume_top_ranks_within_window(spark, fact_dir):
    stream = read_fact_stream(spark, fact_dir)
    got = run_volume_top_stream(stream, k=1, order_by="duration").collect()
    # cells key on (minute, query, pk) → four cnt=1 cells per minute; the
    # per-minute winner is (q1, pk "3", duration 103)
    assert len(got) == 3
    assert all(
        r.query == "q1" and r.primary_key == "3" and r.duration == 103 for r in got
    )


def test_stream_watermarked_plan_builds(spark, fact_dir):
    """Watermarked variant must remain a valid streaming aggregation
    (state eviction path for unbounded sources)."""
    stream = read_fact_stream(spark, fact_dir)
    agg = volume_stream(stream, watermark="10 minutes")
    assert agg.isStreaming
    got = run_stream_to_batch(agg)
    assert got.count() == 3


def test_streaming_production_parse(spark, tmp_path):
    """The full parse_messages pipeline (incl. the pushdown barrier and
    stream-static broadcast joins) must run under readStream and equal
    the batch result."""
    import pandas as pd

    from cassandra_slow_queries_spark.config import AnalysisConfig
    from cassandra_slow_queries_spark.plans.pipeline import parse_messages

    rows = [
        {
            "ts_raw": f"2026-08-13T05:00:{i:02d}.000000Z",
            "message": (
                f"INFO Query too slow, took {100 + i} ms: [1 bound values] "
                f"SELECT * FROM ks1.t1 WHERE k=? LIMIT 1; [k:'v{i % 2}']"
            ),
            "tags": ["prod"],
        }
        for i in range(20)
    ]
    d = str(tmp_path / "raw")
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(d)
    cfg = AnalysisConfig(
        min_count=1,
        schema={"ks1": {"t1": {"primary_key": ["k"], "clustering_key": []}}},
        tags={"prod": "ks1"},
    )
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    fact_stream = parse_messages(stream, spark, cfg)
    assert fact_stream.isStreaming
    got = run_stream_to_batch(volume_stream(fact_stream)).collect()
    batch_fact = parse_messages(static, spark, cfg)
    expected_rows = batch_fact.count()
    assert sum(r.cnt for r in got) == expected_rows == 20
    pks = {r.primary_key for r in batch_fact.collect()}
    assert pks == {"v0", "v1"}


def test_attach_endpoints_matches_driver_math(spark):
    df = spark.createDataFrame(
        [("ks1", "cf1", "pk1"), ("ks2", "cf2", "pk2")],
        "keyspace string, column_family string, primary_key string",
    )
    rows = attach_endpoints(df, provider="fake", n_nodes=6, rf=3).collect()
    for r in rows:
        assert r.endpoints == fake_endpoints(
            r.keyspace, r.column_family, r.primary_key, 6, 3
        )
        assert len(r.endpoints) == 3
        assert all(e.startswith("node") for e in r.endpoints)


def test_endpoints_report_fixed_columns(spark):
    df = spark.createDataFrame(
        [("ks1", "cf1", "pk1")],
        "keyspace string, column_family string, primary_key string",
    )
    report = endpoints_report(attach_endpoints(df), max_endpoints=6)
    assert [c for c in report.columns if c.startswith("Endpoint")] == [
        f"Endpoint{i}" for i in range(6)
    ]
    [row] = report.collect()
    assert row.Endpoint3 is None  # rf=3 → slots 3-5 empty


def test_nodetool_provider_is_gated(spark):
    df = spark.createDataFrame(
        [("ks1", "cf1", "pk1")],
        "keyspace string, column_family string, primary_key string",
    )
    with pytest.raises(Exception, match="NotImplementedError|Cassandra"):
        attach_endpoints(df, provider="nodetool").collect()
    with pytest.raises(ValueError, match="unknown provider"):
        attach_endpoints(df, provider="bogus")


def test_stateful_burst_detection(spark, fact_dir):
    """applyInPandasWithState: running count + EMA carried across
    micro-batches; final state snapshot per key."""
    from cassandra_slow_queries_spark.streaming.stateful import (
        run_burst_detection,
    )

    stream = read_fact_stream(spark, fact_dir)
    out = run_burst_detection(stream, alpha=0.5, burst_threshold=6).collect()
    by_q = {r.query: r for r in out}
    # fixture: 3 minutes x 4 events, q0/q1 alternate -> 6 events each
    assert by_q["q0"].n_events == 6 and by_q["q1"].n_events == 6
    assert by_q["q0"].bursting == 1 and by_q["q1"].bursting == 1
    assert by_q["q0"].ema_duration > 0
