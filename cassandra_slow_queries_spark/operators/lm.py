"""N-gram language-model training and perplexity scoring (Tier 3).

The CCNet-style quality gate (Wenzek et al. 2020): train a small n-gram
LM on a trusted slice of the corpus (e.g. a known-clean language
subset), score every document by its per-token cross-entropy under that
model, and filter or stratify on the score — low-perplexity text reads
like the training slice, high-perplexity text is noise, boilerplate, or
the wrong language. This is the selection signal the heuristic quality
score (functions/text.py:quality_score) cannot provide: it compares a
document against the *corpus distribution*, not against fixed ratios.

Scale shape (the whole point of doing this in Spark):

- **Training** is two hash aggregations over the exploded adjacent
  bigram stream — LINEAR in corpus size, identical shape to
  operators/profile.py:bigram_pmi. The model itself is *collapsed
  counts*: bounded by (observed bigrams, vocabulary), not by corpus
  rows, so it is join-able state, typically broadcast-able after a
  ``min_count`` floor.
- **Scoring** is one explode + a bigram-keyed equi-join of the corpus
  stream against the collapsed model + one per-document aggregation.
  No per-row Python anywhere; every step is whole-stage-codegen
  expressions.

Smoothing is add-k with k = 1/2, written in integer arithmetic so both
engines (and any oracle) divide the SAME exactly-representable values:

    P(y|x) = (n_xy + 1/2) / (n_x + V/2)  ==  (2*n_xy + 1) / (2*n_x + V)

where ``n_x = Σ_y n_xy`` is the context count and ``V`` the training
vocabulary size. A context never seen in training backs off to the
uniform distribution ``1/V``.

Cross-engine float parity (tests/test_entry_oracle.py discipline): the
per-bigram log-probability is rounded to ``lnp_digits`` and summed as
an exact DECIMAL, so the per-document sum is order-independent — the
one place a naive double SUM would diverge between engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.search import tokenize


@dataclass(frozen=True)
class BigramLM:
    """Collapsed-count bigram model: three small join-able frames."""

    bigrams: DataFrame  # (x, y, n_xy)
    contexts: DataFrame  # (x, n_x) with n_x = sum_y n_xy
    vocab: DataFrame  # 1 row: (v) = distinct training tokens


def _adjacent_bigrams(df: DataFrame, text_col: str, carry: list[str]) -> DataFrame:
    """(carry..., x, y) rows for every ADJACENT token bigram — a pure
    array expression per row (slice + transform, no posexplode
    self-join), then one explode: linear in corpus size."""
    toked = df.select(*carry, tokenize(F.col(text_col)).alias("_toks"))
    # greatest(.., 0): an empty/whitespace-only document tokenizes to
    # [] and a bare size()-1 slice length of -1 is a runtime error —
    # one blank row in a web corpus must not kill the job.
    return toked.select(
        *carry,
        F.explode(
            F.expr(
                "transform(slice(_toks, 1, greatest(size(_toks)-1, 0)), "
                "(t, i) -> struct(t AS x, _toks[i+1] AS y))"
            )
        ).alias("_p"),
    ).select(*carry, "_p.x", "_p.y")


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> BigramLM:
    """Two hash aggregations over the adjacent-bigram stream.

    ``min_count`` floors the stored bigram counts (rows below it fall
    back to the unseen-bigram smoothing mass at scoring time) — the
    standard way to keep the model frame broadcast-able on a 100 TB
    corpus whose raw bigram vocabulary would not be. Context counts and
    vocabulary are computed BEFORE the floor, so smoothing denominators
    stay exact.
    """
    pairs = _adjacent_bigrams(df, text_col, [])
    # r13 opt (guide §5): ``ctx`` derives from ``bi`` and scoring
    # consumes both as separate broadcast builds — unmaterialized, the
    # full corpus explode+aggregation subtree executed once PER
    # consumer. The persisted frame is bigram-vocabulary-sized (further
    # floored by ``min_count`` in the stored model), never corpus-sized.
    bi = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .persist()
    )
    ctx = bi.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    if min_count > 1:
        bi = bi.filter(F.col("n_xy") >= min_count)
    vocab = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("_t"))
        .agg(F.count_distinct("_t").alias("v"))
    )
    return BigramLM(bigrams=bi, contexts=ctx, vocab=vocab)


def score_cross_entropy(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
    lnp_digits: int = 9,
    xent_digits: int | None = 6,
) -> DataFrame:
    """Per-document cross-entropy (nats/bigram) under ``lm``:
    ``(id_col, n_bi, xent)``. Lower = more like the training slice.

    One explode of the scored corpus into its bigram stream, one
    (x, y)-keyed join against the collapsed model (broadcast by default
    — a floored model is dimension-sized; set ``broadcast_model=False``
    to let a genuinely huge model shuffle-join), one per-document
    aggregation. Documents with fewer than two tokens have no bigrams
    and score NULL with ``n_bi = 0`` absent — they simply don't appear;
    callers wanting them must left-join back.

    Parity discipline: per-bigram ln-probabilities are rounded to
    ``lnp_digits`` and summed as DECIMAL(28,12) (exact, order-free);
    only the final per-document division returns to double.
    """
    hint = F.broadcast if broadcast_model else (lambda d: d)
    pairs = _adjacent_bigrams(df, text_col, [id_col])
    joined = (
        pairs.join(hint(lm.contexts), "x", "left")
        .join(hint(lm.bigrams), ["x", "y"], "left")
        .crossJoin(F.broadcast(lm.vocab))
    )
    # Integer numerators/denominators; ONE double division; ln; round.
    lnp = F.when(
        F.col("n_x").isNull(), F.log(F.lit(1.0) / F.col("v"))
    ).otherwise(
        F.log(
            (F.lit(2) * F.coalesce(F.col("n_xy"), F.lit(0)) + F.lit(1))
            * F.lit(1.0)
            / (F.lit(2) * F.col("n_x") + F.col("v"))
        )
    )
    scored = joined.select(
        id_col,
        F.round(lnp, lnp_digits).cast("decimal(28,12)").alias("_lnp"),
    )
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bi"),
        ((-F.sum("_lnp")).cast("double") / F.count(F.lit(1))).alias("xent"),
    )
    if xent_digits is not None:
        out = out.withColumn("xent", F.round("xent", xent_digits))
    return out


def perplexity(xent_col: str = "xent") -> Column:
    """exp(cross-entropy): convenience projection for thresholds quoted
    in perplexity units (CCNet quotes ~tens-to-hundreds on natural
    text)."""
    return F.exp(F.col(xent_col))
