"""Model-scored quality inference seam (operators/quality_model.py):
exact replayable scores, partitioning/batch-size invariance, and the
end-to-end keep-threshold behavior a curation run relies on."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.quality_model import (
    fit_quality_model,
    fnv1a64,
    gram_buckets,
    quality_logits_udf,
    score_quality,
)

N_FEATURES = 256
N_CLASSES = 2


def _det_weights(n_features: int, n_classes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic pseudo-trained weights: each cell derived from the
    md5 of its coordinates, in [-0.5, 0.5) — no RNG state anywhere."""
    W = np.empty((n_features, n_classes))
    for i in range(n_features):
        for j in range(n_classes):
            h = hashlib.md5(f"{i},{j}".encode()).hexdigest()
            W[i, j] = int(h[:8], 16) / 2**32 - 0.5
    b = np.array([0.25] + [-0.1] * (n_classes - 1))
    return W, b


def test_fnv1a64_known_vectors():
    # Published FNV-1a test vectors (empty string and "a")
    assert fnv1a64(b"") == 0xCBF29CE484222325
    assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a64(b"hello") == fnv1a64(b"hello")  # stable across calls


def test_gram_buckets_order_and_range():
    toks = ["a", "b", "c"]
    got = gram_buckets(toks, 16, ngram=2)
    # unigrams left-to-right, then bigrams: fixed reduction order
    expect = [
        fnv1a64(b"a") % 16,
        fnv1a64(b"b") % 16,
        fnv1a64(b"c") % 16,
        fnv1a64(b"a b") % 16,
        fnv1a64(b"b c") % 16,
    ]
    assert got == expect
    assert gram_buckets([], 16) == []


def test_logits_exact_hand_computed(spark):
    # 4 features, 1 class, unigrams only: logit == W[bucket] + b exactly
    W = np.array([[1.0], [2.0], [4.0], [8.0]])
    b = np.array([0.5])
    df = spark.createDataFrame([("x",), ("",)], "text string")
    rows = {
        r["text"]: r["lg"]
        for r in df.withColumn(
            "lg", quality_logits_udf(W, b, ngram=1)(F.col("text"))
        ).collect()
    }
    bucket = fnv1a64(b"x") % 4
    assert rows["x"] == [W[bucket, 0] + 0.5]
    assert rows[""] == [0.5]  # empty text scores the bias alone


def test_scores_partition_and_batch_invariant(spark):
    """The replayability gate: identical float64 output regardless of
    partition count or Arrow batch size — a doc's grams always form one
    contiguous reduceat segment, so layout cannot move a single bit."""
    W, b = _det_weights(N_FEATURES, N_CLASSES)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )

    def run(df):
        out = score_quality(df, W, b, ["low", "high"])
        return {
            r["doc_id"]: (tuple(r["q_logits"]), r["q_score"], r["q_pred"])
            for r in out.select("doc_id", "q_logits", "q_score", "q_pred").collect()
        }

    base = run(docs.repartition(1))
    assert run(docs.repartition(13)) == base  # bitwise equality
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        assert run(docs.repartition(3)) == base
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_scores_match_numpy_replay(spark):
    """Independent driver-side replay of the full model over the real
    corpus sample: gather + segmented mean + bias, then softmax."""
    W, b = _det_weights(N_FEATURES, N_CLASSES)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    out = score_quality(docs, W, b, ["low", "high"])
    got = out.select("doc_id", "text", "q_logits", "q_probs").collect()
    assert len(got) == 100
    for r in got:
        idx = gram_buckets((r["text"] or "").split(), N_FEATURES, ngram=2)
        if idx:
            expect = W[np.asarray(idx)].mean(axis=0) + b
        else:
            expect = b
        np.testing.assert_allclose(r["q_logits"], expect, rtol=0, atol=1e-12)
        z = np.exp(expect - expect.max())
        np.testing.assert_allclose(r["q_probs"], z / z.sum(), rtol=0, atol=1e-12)


def test_planted_signal_separates_classes(spark):
    """A model whose 'high' column loads on one marker token must keep
    exactly the marked docs at any threshold between the two masses."""
    n_feat = 64
    W = np.zeros((n_feat, 2))
    marker = fnv1a64(b"GOODTOKEN") % n_feat
    # marked docs have 5 grams, so mean pooling delivers 10/5 = 2 to the
    # high logit; the -1 bias leaves marked at +1 and unmarked at -1
    W[marker, 1] = 10.0
    b = np.array([0.0, -1.0])
    rows = [(i, ("GOODTOKEN filler text" if i % 3 == 0 else "filler text only"),)
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = score_quality(df, W, b, ["low", "high"])
    kept = {r["doc_id"] for r in out.filter(F.col("q_score") > 0.5).collect()}
    assert kept == {i for i in range(60) if i % 3 == 0}
    preds = {r["doc_id"]: r["q_pred"] for r in out.collect()}
    assert all(
        (p == "high") == (i % 3 == 0) for i, p in preds.items()
    )


def test_shape_validation():
    with pytest.raises(ValueError):
        quality_logits_udf(np.zeros(4), np.zeros(1))  # 1-D weights
    with pytest.raises(ValueError):
        quality_logits_udf(np.zeros((4, 2)), np.zeros(3))  # bias mismatch


def _labeled_corpus(spark, n=90):
    rows = []
    for i in range(n):
        if i % 3 == 0:
            rows.append((i, f"clean prose sentence number {i % 5} flows well", "high"))
        else:
            rows.append((i, f"buy now spam spam click here offer {i % 4}", "low"))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_fit_naive_bayes_separates_and_replays(spark):
    from cassandra_slow_queries_spark.operators.quality_model import (
        fit_quality_model,
    )

    train = _labeled_corpus(spark)
    W, b = fit_quality_model(
        train, ["low", "high"], n_features=512, ngram=2
    )
    assert W.shape == (512, 2) and b.shape == (2,)
    # priors: 30 high / 60 low
    np.testing.assert_allclose(np.exp(b), [60 / 90, 30 / 90])

    # training is deterministic: refit (different partitioning) == fit
    W2, b2 = fit_quality_model(
        train.repartition(7), ["low", "high"], n_features=512, ngram=2
    )
    np.testing.assert_array_equal(W, W2)
    np.testing.assert_array_equal(b, b2)

    # driver-side replay of the count matrix → identical W
    counts = np.zeros((512, 2))
    for r in train.collect():
        for bkt in gram_buckets(r["text"].split(), 512, ngram=2):
            counts[bkt, {"low": 0, "high": 1}[r["label"]]] += 1
    expect_W = np.log((counts + 1.0) / (counts.sum(axis=0) + 512.0))
    np.testing.assert_allclose(W, expect_W, rtol=0, atol=1e-12)

    # held-out docs from the same generators classify perfectly
    test_df = spark.createDataFrame(
        [(1000, "clean prose sentence number 9 flows well", "high"),
         (1001, "buy now spam click offer", "low"),
         (1002, "spam spam spam buy", "low")],
        "doc_id long, text string, label string",
    )
    scored = score_quality(test_df, W, b, ["low", "high"], pooling="sum")
    assert all(r["q_pred"] == r["label"] for r in scored.collect())


def test_nb_needs_sum_pooling_under_imbalanced_priors(spark):
    """The reviewer-found argmax flip, pinned: mean pooling divides the
    W term by n_grams but not the bias, so a long document whose grams
    favor the minority class can lose to a strong prior under
    ``pooling="mean"`` while ``pooling="sum"`` (the NB likelihood
    reading) classifies it correctly."""
    # minority class "rare": 1 doc of 10; its marker grams are decisive
    rows = [(i, "common filler words here", "base") for i in range(9)]
    rows.append((9, "zebra quagga okapi zebra", "rare"))
    train = spark.createDataFrame(rows, "doc_id long, text string, label string")
    W, b = fit_quality_model(train, ["base", "rare"], n_features=256, ngram=2)
    assert b[0] > b[1]  # imbalanced priors

    probe = spark.createDataFrame(
        [(0, "zebra quagga okapi zebra zebra quagga okapi zebra")],
        "doc_id long, text string",
    )
    sum_pred = score_quality(probe, W, b, ["base", "rare"], pooling="sum")
    assert sum_pred.collect()[0]["q_pred"] == "rare"
    # and the two poolings genuinely differ in logit gap scaling
    mean_row = score_quality(probe, W, b, ["base", "rare"]).collect()[0]
    sum_row = sum_pred.collect()[0]
    mean_gap = mean_row["q_logits"][1] - mean_row["q_logits"][0]
    sum_gap = sum_row["q_logits"][1] - sum_row["q_logits"][0]
    assert sum_gap > mean_gap


def test_fit_none_label_raises_value_error(spark):
    """A NULL label mixed with an unknown string label must still raise
    the designed ValueError, not a TypeError from sorting None next to
    str."""
    df = spark.createDataFrame(
        [(1, "some text", None), (2, "other text", "mystery")],
        "doc_id long, text string, label string",
    )
    with pytest.raises(ValueError, match="labels outside classes"):
        fit_quality_model(df, ["low", "high"], n_features=64)


def test_fit_rejects_bad_inputs(spark):
    from cassandra_slow_queries_spark.operators.quality_model import (
        fit_quality_model,
    )

    df = spark.createDataFrame(
        [(1, "some text", "mystery")], "doc_id long, text string, label string"
    )
    with pytest.raises(ValueError, match="mystery"):
        fit_quality_model(df, ["low", "high"], n_features=64)
    with pytest.raises(ValueError):
        fit_quality_model(df, ["low", "low"], n_features=64)
    with pytest.raises(ValueError):
        fit_quality_model(df, ["mystery"], n_features=64, smoothing=0.0)


def test_buckets_col_path_is_bitwise_identical(spark):
    """The featurize-once seam: scoring, fitting, profiling, and
    weighing off a precomputed gram_buckets_udf column must reproduce
    the text path BITWISE — same hashing function, same reduction
    order, one corpus tokenization pass instead of five."""
    from cassandra_slow_queries_spark.operators.dsir import (
        dsir_log_weights,
        hashed_ngram_profile,
        log_ratio_vector,
        profile_probs,
    )
    from cassandra_slow_queries_spark.operators.quality_model import (
        gram_buckets_udf,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
        .limit(120)
    )
    bucketed = docs.withColumn(
        "_b", gram_buckets_udf(N_FEATURES, 2)(F.col("text"))
    )

    # scoring parity (trained NB weights exercise fit parity too)
    classes = ["de", "en", "es", "fr", "zh"]
    W_t, b_t = fit_quality_model(
        docs, classes, label_col="lang", n_features=N_FEATURES
    )
    W_b, b_b = fit_quality_model(
        bucketed, classes, label_col="lang",
        n_features=N_FEATURES, buckets_col="_b",
    )
    np.testing.assert_array_equal(W_t, W_b)
    np.testing.assert_array_equal(b_t, b_b)

    via_text = {
        r["doc_id"]: r["q_logits"]
        for r in score_quality(
            docs, W_t, b_t, classes, pooling="sum"
        ).select("doc_id", "q_logits").collect()
    }
    via_buckets = {
        r["doc_id"]: r["q_logits"]
        for r in score_quality(
            bucketed, W_t, b_t, classes, pooling="sum", buckets_col="_b"
        ).select("doc_id", "q_logits").collect()
    }
    assert via_text == via_buckets  # bitwise: same floats exactly

    # profile + weight parity
    p_text = profile_probs(
        hashed_ngram_profile(docs, n_features=N_FEATURES), N_FEATURES
    )
    p_buck = profile_probs(
        hashed_ngram_profile(bucketed, n_features=N_FEATURES, buckets_col="_b"),
        N_FEATURES,
    )
    np.testing.assert_array_equal(p_text, p_buck)
    ratio = log_ratio_vector(p_text, p_text * 0.5 + 0.5 / N_FEATURES)
    w_text = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(docs, ratio).select("doc_id", "dsir_logw").collect()
    }
    w_buck = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(bucketed, ratio, buckets_col="_b")
        .select("doc_id", "dsir_logw").collect()
    }
    assert w_text == w_buck
