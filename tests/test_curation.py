"""Curation operators: sampling / capping / budgeting / contamination.

The catalog entries are value-hash-gated against DuckDB by the driver;
these tests pin the operator-level semantics the oracle can't see —
rate accuracy, determinism across partitionings, prefix-sum equivalence
with the single-window form, and the eval-set broadcast shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.curation import (
    SAMPLE_BUCKETS,
    cap_per_group,
    contamination_check,
    sample_bucket,
    stratified_sample,
    token_budget_select,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"w{i} " * 3 + "common tail text here", ["en", "de", "fr"][i % 3], f"s{i % 5}", 10 + i % 7)
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_sample_bucket_is_stable_and_uniform(spark, docs):
    b = docs.select(sample_bucket("doc_id").alias("b"))
    vals = [r.b for r in b.collect()]
    assert all(0 <= v < SAMPLE_BUCKETS for v in vals)
    # deterministic: same ids → same buckets on a differently-partitioned frame
    vals2 = [
        r.b
        for r in docs.repartition(7).select(sample_bucket("doc_id").alias("b"))
        .collect()
    ]
    assert sorted(vals) == sorted(vals2)


def test_stratified_rates_within_binomial_noise(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.5, "fr": 0.0}, "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en") == 100  # rate 1.0 keeps everything
    assert "fr" not in counts  # rate 0.0 keeps nothing
    assert 25 <= counts.get("de", 0) <= 75  # 0.5 of 100 ± binomial noise


def test_stratified_default_rate_applies_to_unlisted(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 1.0}, "doc_id", default_rate=1.0)
    assert out.count() == 300


def test_cap_per_group_keeps_top_n_deterministically(spark, docs):
    out = cap_per_group(docs, "source", 3, "n_chars", "doc_id")
    assert out.groupBy("source").count().agg(F.max("count")).first()[0] <= 3
    # the kept set is the lexicographically-first under (n_chars desc, id asc)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    import itertools

    rows = docs.select("doc_id", "source", "n_chars").collect()
    expected = set()
    key = lambda r: r.source
    for _, grp in itertools.groupby(sorted(rows, key=key), key=key):
        grp = sorted(grp, key=lambda r: (-r.n_chars, r.doc_id))[:3]
        expected |= {r.doc_id for r in grp}
    assert kept == expected


@pytest.mark.parametrize("num_ranges", [1, 4, 32])
def test_token_budget_equals_global_window(spark, docs, num_ranges):
    """The distributed prefix-sum must equal the single-window form for
    ANY range count (partition boundaries are an implementation detail)."""
    from pyspark.sql import Window

    out = token_budget_select(
        docs, 500, "n_chars", "n_chars", "doc_id", num_ranges=num_ranges
    ).select("doc_id", "cum_tokens")
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    ref = (
        docs.withColumn("cum_tokens", F.sum("n_chars").over(w))
        .filter(F.col("cum_tokens") <= 500)
        .select("doc_id", "cum_tokens")
    )
    got = {(r.doc_id, r.cum_tokens) for r in out.collect()}
    want = {(r.doc_id, r.cum_tokens) for r in ref.collect()}
    assert got == want and len(want) > 0


def test_token_budget_zero_budget_empty(spark, docs):
    assert token_budget_select(docs, 0, "n_chars", "n_chars", "doc_id").count() == 0


def test_contamination_finds_verbatim_overlap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),                      # eval doc
        (1, "prefix " + base),          # contains all 8-grams of base
        (2, "totally unrelated words that do not overlap at all here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = df.filter(F.col("doc_id") == 0)
    out = contamination_check(df, ev, "text", "doc_id", n=8)
    got = {(r.id, r.eval_id) for r in out.filter(F.col("id") != F.col("eval_id")).collect()}
    assert got == {(1, 0)}


def test_contamination_plan_broadcasts_eval_side(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(50)], "doc_id long, text string"
    )
    ev = df.filter(F.col("doc_id") < 2)
    plan = contamination_check(df, ev, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
