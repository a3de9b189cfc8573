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
