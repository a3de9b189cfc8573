"""DSIR-style data selection: importance resampling of a raw corpus
toward a target distribution (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" — the hashed n-gram variant
the paper ships).

The method, re-expressed Spark-first:

1. **Profile** both corpora once: hashed 1..n-gram bucket counts
   (:func:`hashed_ngram_profile`) — an explode + hash aggregate, one
   linear pass each. Feature hashing is the quality model's FNV-1a
   :func:`~cassandra_slow_queries_spark.operators.quality_model.gram_buckets`,
   so DSIR's featurization can never drift from the quality scorer's.
2. **Log-likelihood ratio weights**: each raw document's importance
   weight is ``log p_target(doc) - log p_raw(doc)`` under smoothed
   bag-of-hashed-grams models — a SUM of per-bucket log ratios over the
   document's grams (NOT the scorer's mean-pooling: the weight is a
   likelihood of the whole document, so length matters). The ratio
   vector is one broadcast ``(n_features,)`` float64 array behind an
   Arrow-batched gather+segmented-sum (:func:`dsir_log_weights`) — the
   ``bucket_ids_udf``/``quality_logits_udf`` seam with a sum reduction.
3. **Resample**: draw ``n`` documents without replacement with
   probability ∝ softmax of the log weights via the Gumbel-top-k trick
   (:func:`importance_resample`): key = logw + Gumbel noise, take the
   global top-n. The noise is derived from ``xxhash64(id, seed)``, so
   the draw is deterministic, partition-invariant, and expression-side;
   the top-n itself is ``TakeOrderedAndProject`` (per-partition heaps),
   never a global sort.

Every stage is linear in the corpus with bounded driver state (the two
profiles collapse to one ``n_features``-length array each — a few MB at
the paper's 2^16 buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cassandra_slow_queries_spark.operators.quality_model import (
    batch_bucket_reduce,
    batch_gram_reduce,
    gram_buckets_udf,
)
from cassandra_slow_queries_spark.operators.topk import top_n


def hashed_ngram_profile(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 16,
    ngram: int = 2,
    buckets_col: str | None = None,
) -> DataFrame:
    """``(bucket bigint, count bigint)`` hashed-gram counts of a corpus —
    explode the per-document bucket ids, hash-aggregate. Output
    cardinality is bounded by ``n_features`` regardless of corpus size.

    ``buckets_col``: precomputed bucket-array column (same
    ``n_features``/``ngram``) — profiles off the shared featurization
    instead of re-hashing text."""
    buckets = (
        F.col(buckets_col)
        if buckets_col is not None
        else gram_buckets_udf(n_features, ngram)(F.col(text_col))
    )
    # spread the profile featurize past the input's split count (the r9
    # sf1 lesson) — only when hashing text here; a precomputed
    # buckets_col has no UDF to parallelize and the exchange would
    # shuffle the fat bucket arrays for nothing. Profiling is
    # train-time; the weigh path stays a pure shuffle-free map.
    from cassandra_slow_queries_spark.session import spread_input

    base = df if buckets_col is not None else spread_input(df)
    return (
        base
        .select(F.explode(buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def profile_probs(
    profile: DataFrame, n_features: int, alpha: float = 1.0
) -> np.ndarray:
    """Collect a profile into a dense smoothed probability vector:
    ``p[b] = (count[b] + alpha) / (total + alpha * n_features)``.
    The ONLY driver-side materialization in the pipeline, bounded by
    ``n_features`` — never by corpus size."""
    counts = np.zeros(n_features, dtype=np.float64)
    for row in profile.collect():  # ≤ n_features rows by construction
        counts[int(row["bucket"])] = float(row["count"])
    total = counts.sum()
    return (counts + alpha) / (total + alpha * n_features)


def log_ratio_vector(
    target_probs: np.ndarray, raw_probs: np.ndarray
) -> np.ndarray:
    """Per-bucket ``log(p_target / p_raw)`` — the broadcast model."""
    t = np.asarray(target_probs, dtype=np.float64)
    r = np.asarray(raw_probs, dtype=np.float64)
    if t.shape != r.shape:
        raise ValueError(f"profile shapes differ: {t.shape} vs {r.shape}")
    return np.log(t) - np.log(r)


def dsir_logweight_udf(
    log_ratio: np.ndarray, ngram: int = 2, from_buckets: bool = False
):
    """``text → double``: sum of ``log_ratio[bucket]`` over the
    document's 1..n-gram buckets. Same Arrow gather + ``reduceat`` shape
    as the quality scorer, with a SUM (likelihood of the document)
    instead of a mean. Empty documents weigh 0 (an empty product of
    likelihood ratios). Reduction order is the fixed gram order, so the
    float64 result is bitwise reproducible across partitionings.

    ``from_buckets=True`` consumes a precomputed ``array<bigint>``
    bucket column instead of text (the featurize-once seam)."""
    # (n_features, 1): the shared batch_gram_reduce seam — the Arrow
    # batching/segmentation logic lives in quality_model.py exactly once
    ratio_col = np.ascontiguousarray(log_ratio, dtype=np.float64).reshape(-1, 1)

    @pandas_udf("double")
    def _logw(col: pd.Series) -> pd.Series:
        if from_buckets:
            sums, _ = batch_bucket_reduce(ratio_col, col)
        else:
            sums, _ = batch_gram_reduce(ratio_col, col, ngram)
        return pd.Series(sums[:, 0])

    return _logw


def dsir_log_weights(
    df: DataFrame,
    log_ratio: np.ndarray,
    text_col: str = "text",
    ngram: int = 2,
    out_col: str = "dsir_logw",
    buckets_col: str | None = None,
) -> DataFrame:
    """Attach the DSIR importance log-weight column — one Arrow map
    stage, zero shuffles (pinned in tests/test_scale_plans.py style by
    test_dsir.py). ``buckets_col``: weigh off a precomputed bucket-array
    column instead of re-hashing text."""
    return df.withColumn(
        out_col,
        dsir_logweight_udf(
            log_ratio, ngram, from_buckets=buckets_col is not None
        )(F.col(buckets_col if buckets_col is not None else text_col)),
    )


def importance_resample(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    logw_col: str = "dsir_logw",
    seed: int = 1,
) -> DataFrame:
    """Gumbel-top-``n`` sample without replacement, P(doc) ∝
    ``exp(logw)``: key = ``logw - log(-log(u))`` with ``u`` a
    deterministic uniform in (0, 1) from ``xxhash64(id, seed)``. The
    top-n is :func:`~cassandra_slow_queries_spark.operators.topk.top_n`
    (``TakeOrderedAndProject`` — per-partition heaps, driver merges
    ``n·P`` rows), so resampling a 100 TB corpus ships ``n`` rows per
    task, not the corpus. Ties on the key break on id: a total order,
    so the draw is unique and replayable."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # 2^52, not 2^53: with v ∈ [0, 2^53), (v + 0.5) / 2^53 ROUNDS TO
    # EXACTLY 1.0 at the top of the range (float64 spacing below 1 is
    # 2^-53), and u == 1.0 makes -log(-log(u)) NULL — silently dropping
    # the row that the Gumbel limit says is near-certain to be picked.
    # At 2^52 the extremes (0.5/2^52 and 1 - 2^-53) are exactly
    # representable and strictly inside (0, 1).
    denom = float(1 << 52)
    u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 52)) + 0.5) / F.lit(
        denom
    )
    key = F.col(logw_col) - F.log(-F.log(u))
    keyed = df.withColumn("_gumbel_key", key)
    return top_n(keyed, "_gumbel_key", n, tiebreaks=[id_col]).drop("_gumbel_key")


def save_dsir_profile(
    spark, path: str, log_ratio: np.ndarray, ngram: int = 2
) -> None:
    """Persist the DSIR log-ratio vector as parquet (round-8 verdict
    item 4: the profile is fit once over target+raw corpora, then
    weighs ingest batches for weeks). One row per bucket
    ``(bucket int, log_ratio double)`` plus a one-row meta frame; the
    parquet doubles round-trip bit-exactly, so loaded weights reproduce
    the saved pipeline's Gumbel keys digit for digit (the resample is
    seeded on the weights, so bitwise weight parity IS resample
    parity). Spark-side write keeps the path portable to hdfs://s3a://
    mounts like the quality model's."""
    v = np.asarray(log_ratio, dtype=np.float64)
    if v.ndim != 1:
        raise ValueError(f"log_ratio must be 1-D, got shape {v.shape}")
    rows = [(int(i), float(x)) for i, x in enumerate(v)]
    spark.createDataFrame(rows, "bucket int, log_ratio double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/ratio")
    spark.createDataFrame(
        [(int(v.shape[0]), int(ngram))], "n_features int, ngram int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_dsir_profile(spark, path: str) -> tuple[np.ndarray, int]:
    """Load ``(log_ratio, ngram)`` saved by :func:`save_dsir_profile`,
    bitwise-identical (pinned by tests/test_streaming_inference.py).
    Bounded collect: ≤ n_features rows."""
    meta = spark.read.parquet(f"{path}/meta").collect()
    if len(meta) != 1:
        raise ValueError(f"corrupt profile meta at {path}: {len(meta)} rows")
    n, ngram = meta[0]["n_features"], int(meta[0]["ngram"])
    v = np.full(n, np.nan, dtype=np.float64)
    seen = 0
    for r in spark.read.parquet(f"{path}/ratio").collect():
        v[r["bucket"]] = r["log_ratio"]
        seen += 1
    if seen != n or np.isnan(v).any():
        raise ValueError(f"corrupt profile at {path}: {seen}/{n} buckets")
    return v, ngram
