"""UDTF seam (functions/udtfs.py): the table-function path must stay
exactly equal to the production expression path it demonstrates."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.udtfs import SpanSplitter
from cassandra_slow_queries_spark.operators.dedup import split_spans


def test_span_splitter_equals_expression_path(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\n\nbeta\n\ngamma"),
            (2, "single"),
            (3, ""),
            (4, "lead\n\n\n\ntail"),  # empty middle span survives
        ],
        "doc_id long, text string",
    )
    via_udtf = docs.lateralJoin(SpanSplitter(F.col("text").outer())).select(
        F.col("doc_id").alias("id"), "pos", "span"
    )
    via_expr = split_spans(docs, "text", "doc_id")
    got = sorted(tuple(r) for r in via_udtf.collect())
    want = sorted(tuple(r) for r in via_expr.collect())
    assert got == want and len(want) == 8


def test_span_splitter_null_text_yields_no_rows(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    out = docs.lateralJoin(SpanSplitter(F.col("text").outer()))
    assert out.count() == 0


def test_span_splitter_in_sql(spark):
    spark.udtf.register("span_splitter", SpanSplitter)
    rows = spark.sql(
        "SELECT pos, span FROM span_splitter('a\\n\\nb') ORDER BY pos"
    ).collect()
    assert [(r["pos"], r["span"]) for r in rows] == [(0, "a"), (1, "b")]
