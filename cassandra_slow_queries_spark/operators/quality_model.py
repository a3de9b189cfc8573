"""Model-scored document quality — the fastText-style linear-classifier
inference seam (DCLM / FineWeb-Edu style pretraining curation).

The one curation stage the heuristic tier (functions/text.py
``quality_score``, operators/curation.py ``quality_filter``) does not
cover: scoring every document with a TRAINED linear model over hashed
token n-gram features. Training happens offline (fastText, sklearn —
out of scope here); this module is the inference path a 100 TB curation
run needs:

- the model is ONE broadcast ``(n_features, n_classes)`` weight matrix
  plus a bias vector — a few MB even at 2^20 features, closured into
  the UDF and shipped once per executor;
- scoring is Arrow-batched (the ``bucket_ids_udf`` pattern,
  operators/similarity.py): per batch, every document's n-gram bucket
  ids form one flat gather ``W[idx]`` followed by one segmented
  reduction — the sparse-times-dense GEMM a linear text classifier is.
  No per-row Python UDF, no driver round-trips;
- feature hashing is FNV-1a 64 (pure integer arithmetic), so bucket
  assignment — and therefore every score — is exactly reproducible
  across runs, partitionings, batch sizes, and engines. Scores are
  float64 with a fixed per-document reduction order, so repartitioning
  the corpus cannot change a single bit of the output
  (tests/test_quality_model.py pins this).

Deliberately NOT expression-side: a ``F.lit`` matrix literal works for
tiny models (the expression-width lesson: ONE literal node, never
unrolled chains) but a real quality model has 10^5-10^6 hashed
features, which belongs in a numpy array behind the Arrow seam, not in
a Catalyst plan.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit — tiny, dependency-free, stable across platforms
    (unlike Python's seeded ``hash``). The feature-hashing function."""
    h = _FNV_OFFSET
    for byte in data:
        h = ((h ^ byte) * _FNV_PRIME) & _MASK64
    return h


def gram_buckets(
    tokens: Sequence[str], n_features: int, ngram: int = 2
) -> list[int]:
    """Hashed feature ids of all 1..``ngram``-grams of ``tokens``,
    fastText's wordNgrams hashing trick: ``fnv1a64(gram) % n_features``.
    Order is deterministic (unigrams left-to-right, then bigrams, ...),
    which fixes the per-document float reduction order downstream."""
    out: list[int] = []
    for n in range(1, ngram + 1):
        for i in range(len(tokens) - n + 1):
            g = " ".join(tokens[i : i + n])
            out.append(fnv1a64(g.encode("utf-8")) % n_features)
    return out


def batch_gram_reduce(
    matrix: np.ndarray, texts: "pd.Series", ngram: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-document segmented SUM of ``matrix[bucket]`` over each text's
    1..n-gram buckets: one flat gather ``matrix[all_idx]`` over every
    gram in the batch plus one ``np.add.reduceat`` — the batched sparse
    GEMM. Returns ``(sums (n_docs, n_cols), gram_counts (n_docs,))``;
    empty documents sum to zero. Shared by the quality scorer and the
    DSIR weigher so the Arrow batching/segmentation logic — like the
    :func:`gram_buckets` featurization — exists exactly once.

    Reduction order is the fixed gram order (``reduceat`` is a
    sequential per-segment sum), so results are bitwise reproducible
    across partitionings and batch sizes."""
    n_features = matrix.shape[0]
    bucket_lists = pd.Series(
        [gram_buckets((t or "").split(), n_features, ngram) for t in texts]
    )
    return batch_bucket_reduce(matrix, bucket_lists)


def batch_bucket_reduce(
    matrix: np.ndarray, bucket_lists: "pd.Series"
) -> tuple[np.ndarray, np.ndarray]:
    """:func:`batch_gram_reduce` with the featurization already done —
    ``bucket_lists`` holds each document's gram bucket ids (the
    :func:`gram_buckets_udf` output column). The seam a FEATURIZE-ONCE
    pipeline uses: hash the corpus into bucket arrays one time,
    materialize, and run every downstream model (NB counts, quality
    scores, DSIR profiles/weights) off the same arrays — at 100 TB
    that's one corpus tokenization instead of one per model."""
    flat: list[int] = []
    counts = np.empty(len(bucket_lists), dtype=np.int64)
    for i, idx in enumerate(bucket_lists):
        idx = [] if idx is None else idx
        counts[i] = len(idx)
        flat.extend(idx)
    sums = np.zeros((len(bucket_lists), matrix.shape[1]))
    if flat:
        gathered = matrix[np.asarray(flat, dtype=np.int64)]  # (G, C)
        starts = np.zeros(len(bucket_lists), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        nonempty = counts > 0
        # reduceat needs strictly valid segment starts: compact to
        # the non-empty documents, segment-sum, scatter back
        sums[nonempty] = np.add.reduceat(gathered, starts[nonempty], axis=0)
    return sums, counts


def quality_logits_udf(
    weights: np.ndarray | Sequence[Sequence[float]],
    bias: np.ndarray | Sequence[float],
    ngram: int = 2,
    pooling: str = "mean",
    from_buckets: bool = False,
):
    """``text → array<double>`` of class logits under the linear model
    ``pool(W[gram buckets]) + b``.

    ``pooling="mean"`` is fastText's mean-pooled input layer feeding a
    linear output layer, collapsed to one matrix for inference.
    ``pooling="sum"`` is the likelihood-model reading (multinomial
    Naive Bayes: per-gram log-likelihoods SUM over the document) —
    required for :func:`fit_quality_model` weights whenever the class
    priors are non-uniform, because the mean's ``1/n_grams`` factor
    scales only the W term, not the bias, and so CAN change the argmax
    (a 4-gram document whose grams favor the minority class by 4 nats
    keeps only 1 nat under mean pooling — not enough to beat a 90/10
    prior gap).

    A document with no tokens scores the bias alone under both poolings
    (fastText's behavior for empty input; an empty product of
    likelihoods for NB).

    ``from_buckets=True`` makes the UDF consume a precomputed
    ``array<bigint>`` bucket column (:func:`gram_buckets_udf` output)
    instead of re-hashing text — bitwise-identical logits (pinned by
    tests), one corpus featurization pass shared across models.
    """
    if pooling not in ("mean", "sum"):
        raise ValueError(f"pooling must be 'mean' or 'sum', got {pooling!r}")
    W = np.asarray(weights, dtype=np.float64)
    b = np.asarray(bias, dtype=np.float64)
    if W.ndim != 2:
        raise ValueError(f"weights must be 2-D (n_features, n_classes), got {W.ndim}-D")
    if b.shape != (W.shape[1],):
        raise ValueError(
            f"bias shape {b.shape} does not match n_classes {W.shape[1]}"
        )

    @pandas_udf("array<double>")
    def _logits(col: pd.Series) -> pd.Series:
        if from_buckets:
            sums, counts = batch_bucket_reduce(W, col)
        else:
            sums, counts = batch_gram_reduce(W, col, ngram)
        out = np.tile(b, (len(col), 1))  # start every doc at the bias
        nonempty = counts > 0
        if pooling == "mean":
            out[nonempty] += sums[nonempty] / counts[nonempty, None]
        else:
            out[nonempty] += sums[nonempty]
        return pd.Series(list(out))

    return _logits


def gram_buckets_udf(n_features: int, ngram: int = 2):
    """``text → array<bigint>`` of hashed gram bucket ids — the SAME
    featurization as :func:`quality_logits_udf` (shared
    :func:`gram_buckets` helper), exposed as its own Arrow seam so
    training-side aggregations can explode it. Train and inference
    hashing can never drift: both call one function."""

    @pandas_udf("array<bigint>")
    def _buckets(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [gram_buckets((t or "").split(), n_features, ngram) for t in texts]
        )

    return _buckets


def fit_quality_model(
    df: DataFrame,
    classes: Sequence[str],
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 4096,
    ngram: int = 2,
    smoothing: float = 1.0,
    buckets_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Closed-form multinomial Naive Bayes over the hashed gram
    features — the one linear text classifier trainable in a SINGLE
    distributed pass (no gradient iterations): per-(class, bucket)
    gram counts via explode + hash aggregation, then the add-α
    log-likelihood matrix ``W[f,c] = log((n_fc+α)/(n_c+α·F))`` and log
    priors ``b`` assembled driver-side. Returns ``(W, b)`` ready for
    :func:`score_quality`.

    The only ``collect()`` is the count matrix — bounded by the MODEL
    size (≤ n_features·n_classes cells + one prior row per class, the
    k-means-centroid precedent), never by the corpus. At 100 TB the
    plan is one corpus scan and ONE hash aggregation: every document
    emits a sentinel ``-1`` bucket alongside its gram buckets, so the
    per-class document counts (the priors) ride the same (class,
    bucket) aggregation instead of a second corpus scan.

    Score the returned model with ``pooling="sum"``: NB weights are
    per-gram log-likelihoods that sum to a document log-likelihood.
    Mean pooling preserves the argmax ONLY under uniform priors — its
    ``1/n_grams`` factor scales the W term but not the bias, so with
    imbalanced classes it can flip predictions on long documents (see
    :func:`quality_logits_udf`).

    Rows whose label is not in ``classes`` raise: a silently dropped
    label would bias the priors.

    ``buckets_col``: name of a precomputed ``array<bigint>`` bucket
    column (must have been built with the SAME ``n_features``/``ngram``)
    — skips the featurization pass; see :func:`batch_bucket_reduce`.
    """
    classes = list(classes)
    if len(classes) != len(set(classes)):
        raise ValueError("duplicate class labels")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (zero counts need mass)")
    class_idx = {c: i for i, c in enumerate(classes)}

    buckets = (
        F.col(buckets_col)
        if buckets_col is not None
        else gram_buckets_udf(n_features, ngram)(F.col(text_col))
    )
    # sentinel -1 per document → priors come out of the same aggregation
    with_doc_marker = F.concat(
        F.array(F.lit(-1).cast("bigint")), buckets
    )
    # spread the featurize pass past the input's split count (the r9
    # sf1 lesson: a single-row-group landing file runs the gram-hash
    # UDF on 1-2 cores) — but ONLY when hashing text here: with a
    # precomputed buckets_col there is no per-row UDF to parallelize,
    # and the exchange would shuffle the fat bucket arrays for nothing
    # (measured +9 s at sf1 on the featurize-once entry). Training
    # only — the SCORING path stays a pure shuffle-free map, the
    # property that makes it stream-embeddable (plan-pinned in
    # test_scale_plans.py).
    from cassandra_slow_queries_spark.session import spread_input

    base = df if buckets_col is not None else spread_input(df)
    counts = (
        base
        .select(F.col(label_col).alias("_label"), with_doc_marker.alias("_b"))
        .select("_label", F.explode("_b").alias("_bucket"))
        .groupBy("_label", "_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    bad = sorted(
        {r["_label"] for r in counts if r["_label"] not in class_idx},
        key=lambda x: (x is None, str(x)),  # None labels must not crash the sort
    )
    if bad:
        raise ValueError(f"labels outside classes: {bad}")

    count_mat = np.zeros((n_features, len(classes)))
    n_docs = np.zeros(len(classes))
    for r in counts:
        if r["_bucket"] == -1:
            n_docs[class_idx[r["_label"]]] = r["_n"]
        else:
            count_mat[r["_bucket"], class_idx[r["_label"]]] += r["_n"]
    totals = count_mat.sum(axis=0)
    W = np.log((count_mat + smoothing) / (totals + smoothing * n_features))
    if not n_docs.sum():
        raise ValueError("empty training frame")
    b = np.log(n_docs / n_docs.sum(), where=n_docs > 0,
               out=np.full(len(classes), -np.inf))
    return W, b


def softmax_probs(logits: Column) -> Column:
    """``array<double>`` logits → softmax probabilities, expression-side
    (max-shifted for stability) — the cheap end of the model stays in
    codegen; only the GEMM crosses the Arrow seam."""
    mx = F.array_max(logits)
    exps = F.transform(logits, lambda x: F.exp(x - mx))
    total = F.aggregate(exps, F.lit(0.0), lambda acc, x: acc + x)
    return F.transform(exps, lambda e: e / total)


def score_quality(
    df: DataFrame,
    weights: np.ndarray | Sequence[Sequence[float]],
    bias: np.ndarray | Sequence[float],
    classes: Sequence[str],
    text_col: str = "text",
    ngram: int = 2,
    out_prefix: str = "q_",
    pooling: str = "mean",
    buckets_col: str | None = None,
) -> DataFrame:
    """Attach model-quality columns: ``<prefix>logits`` (array<double>),
    ``<prefix>probs`` (softmax), ``<prefix>pred`` (argmax label, first
    index wins ties), and ``<prefix>score`` — the probability of the
    LAST class in ``classes``, by convention the positive/"keep" class,
    which is the single number a curation threshold consumes.

    ``pooling``: ``"mean"`` for fastText-style trained weights,
    ``"sum"`` for :func:`fit_quality_model`'s Naive Bayes weights (see
    :func:`quality_logits_udf` for why this matters under non-uniform
    priors).

    ``buckets_col``: precomputed bucket-array column — scores off the
    shared featurization instead of re-hashing ``text_col``."""
    classes = list(classes)
    W = np.asarray(weights, dtype=np.float64)
    if len(classes) != W.shape[1]:
        raise ValueError(
            f"{len(classes)} class labels for {W.shape[1]} model outputs"
        )
    logits_col = quality_logits_udf(
        W, bias, ngram=ngram, pooling=pooling,
        from_buckets=buckets_col is not None,
    )(F.col(buckets_col if buckets_col is not None else text_col))
    out = df.withColumn(f"{out_prefix}logits", logits_col)
    probs = softmax_probs(F.col(f"{out_prefix}logits"))
    out = out.withColumn(f"{out_prefix}probs", probs)
    pred = F.element_at(
        F.lit(classes),
        F.array_position(
            F.col(f"{out_prefix}logits"), F.array_max(F.col(f"{out_prefix}logits"))
        ).cast("int"),
    )
    out = out.withColumn(f"{out_prefix}pred", pred)
    return out.withColumn(
        f"{out_prefix}score", F.element_at(F.col(f"{out_prefix}probs"), len(classes))
    )


def save_quality_model(
    spark,
    path: str,
    weights: np.ndarray,
    bias: np.ndarray,
    classes: Sequence[str],
    ngram: int = 2,
) -> None:
    """Persist a trained NB quality model as parquet — a real ingest
    deployment trains once and scores for weeks, so the model must
    outlive the driver (round-8 verdict item 4). Layout under ``path``:

    - ``weights/``: one row per feature, ``(f int, w array<double>)``
      — the per-class log-likelihood row of ``W``;
    - ``meta/``: one row carrying classes, n_features, ngram, and the
      prior vector ``b``.

    Parquet doubles round-trip IEEE-754 bit-exactly (including the
    ``-inf`` prior an absent class gets), which is what makes the
    load-then-score bitwise parity pin possible; a JSON sidecar would
    not survive ``-inf``. Writing through Spark (not a local file API)
    keeps the path portable to any Hadoop-compatible filesystem the
    cluster mounts (hdfs://, s3a://, file://)."""
    W = np.asarray(weights, dtype=np.float64)
    b = np.asarray(bias, dtype=np.float64)
    classes = list(classes)
    if W.ndim != 2 or W.shape[1] != len(classes) or b.shape != (len(classes),):
        raise ValueError(
            f"shape mismatch: W{W.shape}, b{b.shape}, {len(classes)} classes"
        )
    rows = [(int(f), [float(x) for x in W[f]]) for f in range(W.shape[0])]
    spark.createDataFrame(rows, "f int, w array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/weights")
    meta = [(classes, int(W.shape[0]), int(ngram), [float(x) for x in b])]
    spark.createDataFrame(
        meta,
        "classes array<string>, n_features int, ngram int, priors array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_quality_model(
    spark, path: str
) -> tuple[np.ndarray, np.ndarray, list[str], int]:
    """Load a model saved by :func:`save_quality_model`:
    ``(W, b, classes, ngram)``, bitwise-identical to what was saved
    (pinned by tests/test_streaming_inference.py). The collect is the
    model — ≤ n_features rows — the same bounded-materialization
    contract as :func:`fit_quality_model`."""
    meta = spark.read.parquet(f"{path}/meta").collect()
    if len(meta) != 1:
        raise ValueError(f"corrupt model meta at {path}: {len(meta)} rows")
    m = meta[0]
    classes = list(m["classes"])
    # Completeness = exactly the index SET {0..n_features-1}, not a row
    # count: a duplicate f plus a missing one has the right count but
    # leaves a row uninitialized; a negative f would alias onto the
    # last row via numpy indexing; an out-of-range f must be the
    # contract error, not a raw IndexError. Tracking indices (not
    # scanning for NaN) also keeps the documented save/load round-trip
    # for models whose trained weights legitimately contain NaN.
    n_features = m["n_features"]
    W = np.empty((n_features, len(classes)), dtype=np.float64)
    seen: set[int] = set()
    for r in spark.read.parquet(f"{path}/weights").collect():
        f = int(r["f"])
        if not 0 <= f < n_features or f in seen:
            raise ValueError(
                f"corrupt model weights at {path}: feature index {f} "
                f"{'duplicated' if f in seen else 'out of range'} "
                f"(expected each of 0..{n_features - 1} exactly once)"
            )
        seen.add(f)
        W[f] = r["w"]
    if len(seen) != n_features:
        raise ValueError(
            f"corrupt model weights at {path}: {len(seen)} distinct "
            f"feature indices, expected {n_features}"
        )
    return W, np.asarray(m["priors"], dtype=np.float64), classes, int(m["ngram"])
