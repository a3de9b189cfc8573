"""Trained-model inference under Structured Streaming: the quality
scorer and the DSIR weigher are stateless Arrow maps, so they must be
directly embeddable in a readStream plan — score arriving documents
micro-batch by micro-batch with EXACTLY the batch path's numbers. This
is the deployment shape of a curation model at ingest time (score as
data lands, filter before it ever hits the lake), and it works only
because the scorer plans as a pure map (no Exchange, pinned by
test_scale_plans.py) — a scorer that grew a shuffle would be rejected
by the streaming planner or silently re-scope the watermark.
"""

from __future__ import annotations

import numpy as np
import pytest

from cassandra_slow_queries_spark.operators.dsir import dsir_log_weights
from cassandra_slow_queries_spark.operators.quality_model import (
    fit_quality_model,
    score_quality,
)

N_FEATURES = 256


def _docs(spark, n=60):
    rows = [
        (
            i,
            ("alpha beta gamma doc %d" % i)
            if i % 3
            else ("spam spam spam offer %d" % i),
            "ham" if i % 3 else "spam",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_stream_scores_equal_batch_scores(spark, tmp_path):
    docs = _docs(spark)
    W, b = fit_quality_model(
        docs, ["spam", "ham"], label_col="label", n_features=N_FEATURES,
        smoothing=0.01,
    )
    batch = {
        r["doc_id"]: (r["q_logits"], r["q_score"])
        for r in score_quality(
            docs, W, b, ["spam", "ham"], pooling="sum"
        ).collect()
    }

    src = str(tmp_path / "src")
    # two micro-batches (maxFilesPerTrigger=1): the model must not care
    docs.filter("doc_id < 30").select("doc_id", "text").write.mode(
        "append"
    ).parquet(src)
    docs.filter("doc_id >= 30").select("doc_id", "text").write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    scored = score_quality(stream, W, b, ["spam", "ham"], pooling="sum")
    weighted = dsir_log_weights(
        scored, np.zeros(N_FEATURES)  # zero ratio → logw 0.0, shape check
    )
    assert weighted.isStreaming
    q = (
        weighted.select("doc_id", "q_logits", "q_score", "dsir_logw")
        .writeStream.format("memory")
        .queryName("scored_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: (r["q_logits"], r["q_score"], r["dsir_logw"])
        for r in spark.sql("SELECT * FROM scored_stream").collect()
    }
    assert set(got) == set(batch)
    for doc_id, (logits, score, logw) in got.items():
        # bitwise: the Arrow GEMM's reduction order is fixed per doc
        assert logits == batch[doc_id][0]
        assert score == batch[doc_id][1]
        assert logw == 0.0


def test_model_persistence_bitwise_score_parity(spark, tmp_path):
    """Save → load → score must equal fit → score BITWISE (round-8
    verdict item 4): a deployment trains once and scores for weeks, so
    any drift through persistence would silently skew curation. Parquet
    doubles round-trip IEEE-754 exactly — including the -inf prior a
    class absent from training gets — and the scorer is deterministic,
    so exact float equality is the correct assertion, not allclose."""
    import math

    from cassandra_slow_queries_spark.operators.dsir import (
        dsir_log_weights,
        hashed_ngram_profile,
        load_dsir_profile,
        log_ratio_vector,
        profile_probs,
        save_dsir_profile,
    )
    from cassandra_slow_queries_spark.operators.quality_model import (
        load_quality_model,
        save_quality_model,
    )

    docs = _docs(spark)
    W, b = fit_quality_model(
        docs, ["spam", "ham"], label_col="label", n_features=N_FEATURES,
        smoothing=0.01,
    )
    save_quality_model(spark, str(tmp_path / "qm"), W, b, ["spam", "ham"])
    W2, b2, classes2, ngram2 = load_quality_model(spark, str(tmp_path / "qm"))
    assert (W == W2).all() and (b == b2).all()
    assert classes2 == ["spam", "ham"] and ngram2 == 2

    fresh = score_quality(docs, W, b, ["spam", "ham"], pooling="sum")
    loaded = score_quality(docs, W2, b2, classes2, ngram=ngram2, pooling="sum")
    f = {r["doc_id"]: r for r in fresh.collect()}
    for r in loaded.collect():
        assert r["q_logits"] == f[r["doc_id"]]["q_logits"]  # bitwise
        assert r["q_score"] == f[r["doc_id"]]["q_score"]

    # DSIR: target = ham docs, raw = everything
    target = hashed_ngram_profile(
        docs.filter("label = 'ham'"), n_features=N_FEATURES
    )
    raw = hashed_ngram_profile(docs, n_features=N_FEATURES)
    ratio = log_ratio_vector(
        profile_probs(target, N_FEATURES, alpha=0.01),
        profile_probs(raw, N_FEATURES, alpha=0.01),
    )
    save_dsir_profile(spark, str(tmp_path / "dsir"), ratio)
    ratio2, dngram = load_dsir_profile(spark, str(tmp_path / "dsir"))
    assert (ratio == ratio2).all() and dngram == 2

    w1 = {r["doc_id"]: r["dsir_logw"]
          for r in dsir_log_weights(docs, ratio).collect()}
    for r in dsir_log_weights(docs, ratio2).collect():
        assert r["dsir_logw"] == w1[r["doc_id"]]  # bitwise
        assert math.isfinite(r["dsir_logw"])


def test_model_persistence_rejects_corrupt_and_bad_shapes(spark, tmp_path):
    from cassandra_slow_queries_spark.operators.quality_model import (
        load_quality_model,
        save_quality_model,
    )

    with pytest.raises(ValueError):
        save_quality_model(
            spark, str(tmp_path / "x"), np.zeros((4, 2)), np.zeros(3), ["a", "b"]
        )
    # a model whose weights frame lost rows must not load silently
    save_quality_model(
        spark, str(tmp_path / "m"), np.zeros((4, 2)), np.zeros(2), ["a", "b"]
    )
    import shutil

    meta = spark.read.parquet(str(tmp_path / "m/meta")).collect()[0]
    assert meta["n_features"] == 4
    shutil.rmtree(str(tmp_path / "m/weights"))
    spark.createDataFrame(
        [(0, [0.0, 0.0])], "f int, w array<double>"
    ).write.parquet(str(tmp_path / "m/weights"))
    with pytest.raises(ValueError, match="corrupt"):
        load_quality_model(spark, str(tmp_path / "m"))

    # a weights frame with a DUPLICATE f index and a missing one has the
    # right row COUNT but would leave one feature row uninitialized —
    # must raise, not silently return garbage scores
    save_quality_model(
        spark, str(tmp_path / "d"), np.ones((3, 2)), np.zeros(2), ["a", "b"]
    )
    shutil.rmtree(str(tmp_path / "d/weights"))
    spark.createDataFrame(
        [(0, [1.0, 1.0]), (0, [1.0, 1.0]), (2, [1.0, 1.0])],
        "f int, w array<double>",
    ).write.parquet(str(tmp_path / "d/weights"))
    with pytest.raises(ValueError, match="corrupt"):
        load_quality_model(spark, str(tmp_path / "d"))

    # a NEGATIVE f would alias onto the last row via numpy indexing
    # (right row count, no gap) — must be the contract error, and an
    # out-of-range f must be the contract error, not a raw IndexError
    for rows in ([(-1, [1.0, 1.0]), (0, [1.0, 1.0]), (1, [1.0, 1.0])],
                 [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (7, [1.0, 1.0])]):
        save_quality_model(
            spark, str(tmp_path / "n"), np.ones((3, 2)), np.zeros(2), ["a", "b"]
        )
        shutil.rmtree(str(tmp_path / "n/weights"))
        spark.createDataFrame(rows, "f int, w array<double>").write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "n/weights"))
        with pytest.raises(ValueError, match="corrupt"):
            load_quality_model(spark, str(tmp_path / "n"))
        shutil.rmtree(str(tmp_path / "n"))

    # legitimately-NaN trained weights must still round-trip (the
    # completeness check tracks indices, it does not scan for NaN)
    Wn = np.ones((2, 2))
    Wn[1, 0] = np.nan
    save_quality_model(spark, str(tmp_path / "nan"), Wn, np.zeros(2), ["a", "b"])
    W2, _, _, _ = load_quality_model(spark, str(tmp_path / "nan"))
    assert np.isnan(W2[1, 0]) and W2[0, 0] == 1.0
