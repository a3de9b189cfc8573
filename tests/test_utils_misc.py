"""Small utility surfaces not covered by the operator suites: char
n-grams, squared-L2, the corrupt-record counter, and the nodetool call
shape (mocked — no Cassandra in the container)."""

from __future__ import annotations

import json

import pytest

from tests.conftest import eval_expr


def test_char_ngrams(spark):
    from cassandra_slow_queries_spark.functions.text import char_ngrams

    [out] = eval_expr(spark, [("abcdef",)], "t string", char_ngrams("t", 5))
    assert out == ["abcde", "bcdef"]
    [short] = eval_expr(spark, [("abc",)], "t string", char_ngrams("t", 5))
    assert short == []


def test_squared_l2(spark):
    from cassandra_slow_queries_spark.functions.vectors import squared_l2

    [out] = eval_expr(
        spark,
        [([1.0, 2.0, 3.0], [4.0, 0.0, 3.0]),],
        "a array<double>, b array<double>",
        squared_l2("a", "b"),
    )
    assert out == pytest.approx(9.0 + 4.0)


def test_corrupt_record_count(spark, tmp_path):
    from cassandra_slow_queries_spark.sources.kibana import corrupt_record_count

    good = {"responses": [{"hits": {"hits": []}}]}
    (tmp_path / "good.json").write_text(json.dumps(good))
    (tmp_path / "bad.json").write_text("{this is : not json")
    n = corrupt_record_count(
        spark, [str(tmp_path / "good.json"), str(tmp_path / "bad.json")]
    )
    assert n == 1


def test_nodetool_endpoints_call_shape(monkeypatch):
    from cassandra_slow_queries_spark.operators import endpoints as ep

    calls = {}

    class FakeResult:
        stdout = "10.0.0.1\n10.0.0.2\n\n"

    def fake_run(cmd, capture_output, text, check):
        calls["cmd"] = cmd
        return FakeResult()

    monkeypatch.setattr(ep.subprocess, "run", fake_run)
    out = ep.nodetool_endpoints("ks1", "cf1", "pk1")
    assert out == ["10.0.0.1", "10.0.0.2"]
    assert calls["cmd"] == ["nodetool", "getendpoints", "ks1", "cf1", "pk1"]


def test_profile_columns_nulls_and_modes(spark):
    from cassandra_slow_queries_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, s string",
    )
    out = {
        r["column"]: (r.n_rows, r.n_nulls, r.n_distinct, r.min_value, r.max_value)
        for r in profile_columns(df, ["k", "s"], distinct="exact").collect()
    }
    assert out["k"] == (4, 1, 2, "1", "2")
    assert out["s"] == (4, 1, 2, "a", "b")
    # approx mode: same shape, distinct within HLL tolerance (tiny input → exact)
    approx = {
        r["column"]: r.n_distinct
        for r in profile_columns(df, ["k", "s"], distinct="approx").collect()
    }
    assert approx == {"k": 2, "s": 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile_columns(df, ["k"], distinct="bogus")


def test_profile_embeddings_flags_mismatch_and_zero_norm(spark):
    from cassandra_slow_queries_spark.operators.profile import (
        profile_embeddings,
    )

    rows = [
        (0, [3.0, 4.0]),        # norm 5
        (1, [0.0, 0.0]),        # zero norm
        (2, [1.0, 0.0, 0.0]),   # dim 3 (the max → the reference dim)
        (3, None),              # null vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    [r] = profile_embeddings(df, "embedding").collect()
    assert (r.n_rows, r.n_nulls, r.min_dim, r.max_dim) == (4, 1, 2, 3)
    # rows 0, 1 (dim 2) and the NULL row mismatch the max dim 3
    assert r.n_dim_mismatch == 3
    assert r.n_zero_norm == 1
    # avg over non-null norms: (5 + 0 + 1) / 3
    assert r.avg_norm == 2.0
    # explicit expected_dim: only the dim-3 row conforms... to dim 2
    [r2] = profile_embeddings(df, "embedding", expected_dim=2).collect()
    assert r2.n_dim_mismatch == 2  # dim-3 row + NULL row


def test_histogram_fixed_bounds_clamp_and_empty_bins(spark):
    from cassandra_slow_queries_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (3.0,), (9.999,), (10.0,), (25.0,), (None,)],
        "v: double",
    )
    out = {r["bin"]: r.asDict() for r in histogram(df, "v", bins=4, lo=0, hi=20).collect()}
    assert len(out) == 4  # all bins present
    # -5 clamps into bin 0; 10.0 lands exactly on the bin-2 edge;
    # 25 clamps into the top bin; NULL excluded
    assert out[0]["n"] == 3 and out[1]["n"] == 1
    assert out[2]["n"] == 1 and out[3]["n"] == 1
    assert out[1]["lo_edge"] == 5.0 and out[1]["hi_edge"] == 10.0


def test_histogram_derived_bounds_and_degenerate_range(spark):
    from cassandra_slow_queries_spark.operators.profile import histogram

    df = spark.createDataFrame([(2.0,), (4.0,), (6.0,)], "v: double")
    out = {r["bin"]: r.asDict() for r in histogram(df, "v", bins=2).collect()}
    assert out[0]["lo_edge"] == 2.0 and out[1]["hi_edge"] == 6.0
    assert out[0]["n"] == 1 and out[1]["n"] == 2  # 4.0 goes to bin 1 ((4-2)/2=1)

    same = spark.createDataFrame([(7.0,), (7.0,)], "v: double")
    deg = histogram(same, "v", bins=3).collect()
    assert [r["n"] for r in deg] == [2, 0, 0]  # lo==hi: everything in bin 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        histogram(df, "v", bins=0)


def test_heavy_hitters_guarantee_and_exactness(spark):
    """Every item above the n/(k+1) threshold is found with its EXACT
    count; items at or below the threshold never appear; NULLs ignored."""
    from cassandra_slow_queries_spark.operators.profile import heavy_hitters

    # 100 'a' + 40 'b' + 60 unique singletons + NULLs; n=200
    rows = (
        [("a",)] * 100 + [("b",)] * 40 + [(f"u{i}",) for i in range(60)]
        + [(None,)] * 7
    )
    df = spark.createDataFrame(rows, "item: string").repartition(8)
    out = {r["item"]: r["n_item"] for r in heavy_hitters(df, "item", k=4).collect()}
    # threshold n/5 = 40: 'a' (100) qualifies, 'b' (40) is NOT strictly above
    assert out == {"a": 100}
    out2 = {r["item"]: r["n_item"] for r in heavy_hitters(df, "item", k=9).collect()}
    # threshold n/10 = 20: both
    assert out2 == {"a": 100, "b": 40}


def test_heavy_hitters_candidate_state_is_bounded(spark):
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.profile import heavy_hitters

    df = spark.range(10_000).select(
        (F.col("id") % 500).cast("string").alias("item")
    ).repartition(4)
    cand = heavy_hitters(df, "item", k=10, verify=False)
    # ≤ k counters per partition survive the scan
    assert cand.count() <= 10 * 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        heavy_hitters(df, "item", k=0)


def test_bigram_pmi_survives_empty_documents(spark):
    # the local bigram expression had drifted away lm.py's
    # greatest(size-1, 0) guard: one blank row killed the whole job
    from cassandra_slow_queries_spark.operators.profile import bigram_pmi

    df = spark.createDataFrame(
        [("a b a b",), ("",), ("   ",)], "text string"
    )
    rows = bigram_pmi(df, "text", min_count=1).collect()
    assert {(r["x"], r["y"]) for r in rows} == {("a", "b"), ("b", "a")}


def test_profile_embeddings_all_null_batch_flags_all_mismatched(spark):
    from cassandra_slow_queries_spark.operators.profile import (
        profile_embeddings,
    )

    df = spark.createDataFrame(
        [(None,), (None,), (None,)], "embedding array<double>"
    )
    [r] = profile_embeddings(df, "embedding").collect()
    assert r["n_rows"] == 3 and r["n_nulls"] == 3
    assert r["n_dim_mismatch"] == 3  # was NULL: the poisoned batch passed


def test_extract_features_null_payload_yields_null_metrics(spark):
    from cassandra_slow_queries_spark.operators.multimodal import (
        extract_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"xx")), (2, None)], "media_id long, content binary"
    )
    got = {r["media_id"]: r for r in extract_features(df).collect()}
    assert got[1]["n_bytes"] == 2 and got[1]["features"] is not None
    assert got[2]["n_bytes"] is None and got[2]["features"] is None


def test_frame_sample_plan_validates_every_n(spark):
    import pytest as _pt

    from cassandra_slow_queries_spark.operators.multimodal import (
        frame_sample_plan,
    )

    df = spark.createDataFrame([(1,)], "media_id long")
    for bad in (0, -5):
        with _pt.raises(ValueError, match="every_n"):
            frame_sample_plan(df, every_n=bad)


def test_bpe_explicit_arrow_engine_gated_when_pandas_missing(spark, monkeypatch):
    from cassandra_slow_queries_spark.operators import bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "_pd", None)
    df = spark.createDataFrame([("a b",)], "text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="pandas"):
        bpe_mod.encode(df, [("a", "b", 1)], engine="arrow")


def test_interval_join_rejects_decimal_coordinates(spark):
    # decimal coordinates type-check but silently drop true matches in
    # the integer bucket cover — the join must fail eagerly instead
    import pytest as _pt

    from cassandra_slow_queries_spark.operators.rangejoin import (
        interval_join,
    )

    pts = spark.sql("SELECT CAST(64.2 AS DECIMAL(10,1)) AS v")
    ivs = spark.sql(
        "SELECT CAST(63.9 AS DECIMAL(10,1)) AS lo, "
        "CAST(64.5 AS DECIMAL(10,1)) AS hi"
    )
    with _pt.raises(ValueError, match="integral"):
        interval_join(pts, ivs, "v", bucket_width=64)
