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
