"""GROUPED_AGG pandas UDAF seam (functions/udafs.py): pinned equal to
its expression twin, completing the §2.10 escape-hatch family."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.udafs import (
    geometric_mean_expr,
    geometric_mean_udaf,
)


@pytest.fixture(scope="module")
def grouped(spark):
    rows = [
        ("a", 2.0), ("a", 8.0),            # geomean 4
        ("b", 3.0), ("b", 9.0), ("b", 27.0),  # geomean 9
        ("c", 5.0),
    ]
    return spark.createDataFrame(rows, ["g", "x"])


def test_geomean_expr_closed_form(grouped):
    out = {
        r["g"]: r["gm"]
        for r in grouped.groupBy("g")
        .agg(geometric_mean_expr("x").alias("gm"))
        .collect()
    }
    assert out["a"] == pytest.approx(4.0)
    assert out["b"] == pytest.approx(9.0)
    assert out["c"] == pytest.approx(5.0)


def test_udaf_equals_expression(grouped):
    expr = {
        r["g"]: r["gm"]
        for r in grouped.groupBy("g")
        .agg(geometric_mean_expr("x").alias("gm"))
        .collect()
    }
    udaf = {
        r["g"]: r["gm"]
        for r in grouped.groupBy("g")
        .agg(geometric_mean_udaf("x").alias("gm"))
        .collect()
    }
    assert set(expr) == set(udaf)
    for g in expr:
        assert udaf[g] == pytest.approx(expr[g], rel=1e-12)


def test_udaf_on_corpus_durations(spark):
    # the realistic shape: per-event-type geometric mean duration,
    # zeros filtered (ln(0) = -inf on both paths)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = ev.select(
        "event_type", F.floor("value").cast("double").alias("dur")
    ).filter(F.col("dur") > 0)
    expr = {
        r["event_type"]: r["gm"]
        for r in d.groupBy("event_type")
        .agg(F.round(geometric_mean_expr("dur"), 9).alias("gm"))
        .collect()
    }
    udaf = {
        r["event_type"]: r["gm"]
        for r in d.groupBy("event_type")
        .agg(F.round(geometric_mean_udaf("dur"), 9).alias("gm"))
        .collect()
    }
    assert expr and expr.keys() == udaf.keys()
    for g in expr:
        assert udaf[g] == pytest.approx(expr[g], abs=1e-6)


def test_udaf_matches_expression_on_zeros(spark):
    # ln(0) is NULL in SQL (skipped by avg); the UDAF must drop
    # non-positive values the same way, not fold -inf into the mean
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 4.0), ("a", 9.0), ("z", 0.0), ("z", -1.0)],
        ["g", "x"],
    )
    expr = {
        r["g"]: r["gm"]
        for r in df.groupBy("g")
        .agg(geometric_mean_expr("x").alias("gm"))
        .collect()
    }
    udaf = {
        r["g"]: r["gm"]
        for r in df.groupBy("g")
        .agg(geometric_mean_udaf("x").alias("gm"))
        .collect()
    }
    assert expr["a"] == pytest.approx(6.0) and udaf["a"] == pytest.approx(6.0)
    assert expr["z"] is None and udaf["z"] is None
