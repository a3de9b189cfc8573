"""Winnowing fingerprints (operators/dedup.py), clean_text
(functions/text.py), and the aggregate-pushdown plan hook
(plans/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.text import clean_text
from cassandra_slow_queries_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_match_pairs,
)


# ---------------------------------------------------------- winnowing ---


def test_winnow_guarantee_shared_substring(spark):
    # Schleimer guarantee: a shared substring of length >= window+k-1
    # (= 4+8-1 = 11 here) must produce at least one shared fingerprint,
    # regardless of its alignment inside each document.
    shared = "zqxjkwvbnmp"  # 11 chars, nothing like the filler
    df = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaa " + shared + " bbbbbbbbbbbbbbb"),
            (2, "cccccccccccc" + shared + "dddddddddddddddddd"),
            (3, "eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=8, window=4)
    f1 = {r["fp"] for r in fps.filter("id = 1").collect()}
    f2 = {r["fp"] for r in fps.filter("id = 2").collect()}
    f3 = {r["fp"] for r in fps.filter("id = 3").collect()}
    assert f1 & f2, "shared 11-char substring must share a fingerprint"
    assert not (f1 & f3) and not (f2 & f3)


def test_winnow_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abc"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    rows = winnow_fingerprints(df, k=8, window=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["fp"])
    # exactly one 8-gram for doc 1; shorter/empty/null docs vanish
    assert len(by_id.get(1, [])) == 1
    assert 2 not in by_id and 3 not in by_id and 4 not in by_id


def test_winnow_match_pairs_counts_and_cap(spark):
    base = "the quick brown fox jumps over the lazy dog again"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally unrelated content here xyz")],
        ["doc_id", "text"],
    )
    pairs = winnow_match_pairs(df, min_shared=2).collect()
    assert len(pairs) == 1
    p = pairs[0]
    n_fp_doc1 = winnow_fingerprints(df).filter("id = 1").count()
    assert (p["id_a"], p["id_b"]) == (1, 2)
    # identical docs share ALL fingerprints
    assert p["n_shared"] == n_fp_doc1
    # cap=1: every fingerprint appears in 2 docs > 1 → all dropped
    assert (
        winnow_match_pairs(df, min_shared=1, max_fp_freq=1).count() == 0
    )


# --------------------------------------------------------- clean_text ---

CLEAN_CASES = [
    ("a\tb\n\nc", "a b c"),
    ("  spaced   out  ", "spaced out"),
    ("a\x00b\x07c\x1fd", "abcd"),
    ("z​w‌‍x﻿y", "zwxy"),
    ("\x0b\x0cab", "ab"),  # the RE2-vs-Java \s divergence chars
    ("", ""),
    ("already clean", "already clean"),
]


@pytest.mark.parametrize("raw,want", CLEAN_CASES)
def test_clean_text_cases(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "t string")
    assert df.select(clean_text("t").alias("c")).collect()[0]["c"] == want


def test_clean_text_null(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(clean_text("t").alias("c")).collect()[0]["c"] is None


# ------------------------------------------------------- agg pushdown ---


def test_pushed_aggregation_hook(spark, tmp_path):
    from cassandra_slow_queries_spark.plans.layout import pushed_aggregation

    path = str(tmp_path / "p")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(path)
    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown", None)
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        agg = spark.read.parquet(path).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        pushed = pushed_aggregation(agg)
        assert pushed.startswith("COUNT(*)")
        assert "MIN(v)" in pushed and "MAX(v)" in pushed
        assert agg.collect()[0]["n"] == 100
        # a filtered scan cannot be answered from footers → no pushdown
        filtered = (
            spark.read.parquet(path)
            .filter(F.col("v") > 10)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert pushed_aggregation(filtered) == ""
    finally:
        for key, prev in (
            ("spark.sql.parquet.aggregatePushdown", prev_push),
            ("spark.sql.sources.useV1SourceList", prev_v1),
        ):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
