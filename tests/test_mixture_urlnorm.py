"""Mixture sampling (operators/curation.py:mixture_sample) and URL
canonicalization (functions/urlnorm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.urlnorm import canonical_url
from cassandra_slow_queries_spark.operators.curation import (
    SAMPLE_BUCKETS,
    mixture_sample,
    sample_bucket,
)


@pytest.fixture(scope="module")
def sources_df(spark):
    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    return spark.createDataFrame(rows, ["id", "src"])


def test_mixture_explicit_weights_rates(spark, sources_df):
    # 50/50 target over an 800/200 corpus with budget 400:
    # big: rate = 400*0.5/800 = 0.25 → cut 2500
    # small: rate = 400*0.5/200 = 1.0 → cut 10000 (keep all)
    out = mixture_sample(
        sources_df, "src", "id", budget=400,
        weights={"big": 0.5, "small": 0.5}, rate_col="keep",
    )
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    assert all(r["bucket_cut"] == 2500 for r in by_src["big"])
    assert all(r["bucket_cut"] == 10000 for r in by_src["small"])
    assert len(by_src["small"]) == 200  # saturation: all kept
    # big rows kept are exactly those with bucket < 2500 — replayable.
    kept_ids = {r["id"] for r in by_src["big"]}
    buckets = {
        r["id"]: r["b"]
        for r in sources_df.filter(F.col("src") == "big")
        .select("id", sample_bucket("id").alias("b"))
        .collect()
    }
    assert kept_ids == {i for i, b in buckets.items() if b < 2500}


def test_mixture_unlisted_source_dropped(spark, sources_df):
    out = mixture_sample(
        sources_df, "src", "id", budget=100, weights={"big": 1.0}
    )
    assert out.filter(F.col("src") == "small").count() == 0


def test_mixture_temperature_upweights_small(spark, sources_df):
    # α=0.5: w_big=sqrt(800)≈28.3, w_small=sqrt(200)≈14.1 → small's
    # target share (1/3) far above its natural share (0.2).
    out = mixture_sample(
        sources_df, "src", "id", budget=300, temperature=0.5,
        rate_col="keep",
    )
    cuts = {
        r["src"]: r["bucket_cut"]
        for r in out.select("src", "bucket_cut").distinct().collect()
    }
    # expected: big rate = 300*(2/3)/800 = 0.25 → 2500;
    # small rate = 300*(1/3)/200 = 0.5 → 5000
    assert cuts["big"] == 2500
    assert cuts["small"] == 5000


def test_mixture_param_validation(sources_df):
    with pytest.raises(ValueError):
        mixture_sample(sources_df, "src", "id", 10)
    with pytest.raises(ValueError):
        mixture_sample(
            sources_df, "src", "id", 10,
            weights={"big": 0.5}, temperature=1.0,
        )
    with pytest.raises(ValueError):
        mixture_sample(sources_df, "src", "id", 10, weights={"big": 0.7})


# ---------------------------------------------------------------- URL ---

CASES = [
    # scheme/host case + www + fragment
    ("HTTPS://WWW.Example.COM/Path#frag", "https://example.com/Path"),
    # path case preserved
    ("http://A.com/CaseSensitive", "http://a.com/CaseSensitive"),
    # default ports stripped; non-default kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),
    # tracking params dropped, rest sorted, '?' dropped when empty
    ("http://a.com/x?utm_source=t&b=2&a=1", "http://a.com/x?a=1&b=2"),
    ("http://a.com/x?utm_campaign=c&fbclid=z", "http://a.com/x"),
    ("http://a.com/x?gclid=1&z=9&gclid2=keep",
     "http://a.com/x?gclid2=keep&z=9"),
    # trailing slash & root
    ("https://a.com/path/", "https://a.com/path"),
    ("https://a.com/", "https://a.com"),
    ("https://a.com", "https://a.com"),
    # all together
    ("HTTP://WWW.A.com:80/p/?utm_medium=m&B=1#sec", "http://a.com/p?B=1"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url_cases(spark, raw, want):
    got = (
        spark.range(1)
        .select(canonical_url(F.lit(raw)).alias("u"))
        .collect()[0]["u"]
    )
    assert got == want


def test_canonical_url_null_safe(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert (
        df.select(canonical_url("url").alias("u")).collect()[0]["u"] is None
    )


def test_canonical_url_collapses_known_aliases(spark):
    variants = [
        "https://www.site.org/a/b?utm_source=x&q=1",
        "HTTPS://site.org:443/a/b/?q=1#top",
        "https://site.org/a/b?q=1",
    ]
    df = spark.createDataFrame([(v,) for v in variants], ["url"])
    n = (
        df.select(canonical_url("url").alias("c"))
        .distinct()
        .count()
    )
    assert n == 1


def test_mixture_rate_col_name_honored(spark, sources_df):
    out = mixture_sample(
        sources_df, "src", "id", budget=100,
        weights={"big": 0.5, "small": 0.5}, rate_col="keep_rate",
    )
    assert "keep_rate" in out.columns and "bucket_cut" in out.columns


def test_extract_urls_cases(spark):
    from cassandra_slow_queries_spark.functions.urlnorm import (
        extract_urls,
        url_host,
    )

    text = (
        "see https://a.com/x, then HTTP://WWW.B.org/y. "
        "(also https://c.net/z?q=1) but not ftp://d.com nor plain text"
    )
    df = spark.createDataFrame([(text,)], "t string")
    urls = df.select(extract_urls("t").alias("u")).collect()[0]["u"]
    # trailing sentence punctuation stripped; uppercase scheme matched;
    # closing paren terminates the match; ftp ignored
    assert urls == [
        "https://a.com/x",
        "HTTP://WWW.B.org/y",
        "https://c.net/z?q=1",
    ]
    hosts = (
        spark.createDataFrame([(u,) for u in urls], ["u"])
        .select(url_host(F.lower("u")).alias("h"))
        .collect()
    )
    assert [r["h"] for r in hosts] == ["a.com", "b.org", "c.net"]


def test_extract_urls_none_found(spark):
    from cassandra_slow_queries_spark.functions.urlnorm import extract_urls

    df = spark.createDataFrame([("no links here",), (None,)], "t string")
    out = df.select(extract_urls("t").alias("u")).collect()
    assert out[0]["u"] == []
    assert out[1]["u"] is None


def test_url_host_uppercase_scheme_composes(spark):
    # url_host must handle the uppercase mentions extract_urls keeps —
    # no empty-host group (review finding: the two siblings must
    # compose on raw mentions without a caller-side lower)
    from cassandra_slow_queries_spark.functions.urlnorm import url_host

    df = spark.createDataFrame(
        [("HTTPS://WWW.Site.ORG/x",), ("http://a.com/y",)], ["u"]
    )
    hosts = [r["h"] for r in df.select(url_host("u").alias("h")).collect()]
    assert hosts == ["site.org", "a.com"]
