"""DSIR importance resampling (operators/dsir.py): profiles replay a
Python Counter, log-weights replay numpy bit for bit and are
partition-invariant, the planted-shift selection behaves like the paper
promises, and the Gumbel draw is a deterministic expression replayed
driver-side. Plus the scale-plan audit: the weight stage is one Arrow
map with no shuffle, and the resample is TakeOrderedAndProject."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.dsir import (
    dsir_log_weights,
    hashed_ngram_profile,
    importance_resample,
    log_ratio_vector,
    profile_probs,
)
from cassandra_slow_queries_spark.operators.quality_model import gram_buckets

N_FEATURES = 512


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def corpora(spark):
    """Raw corpus: common filler; every 4th doc carries marker tokens.
    Target corpus: marker-dominated (the distribution we select toward)."""
    raw_texts = []
    for i in range(120):
        base = f"filler{i % 7} common text about thing{i % 11} number {i % 5}"
        if i % 4 == 0:
            # same PHRASE as the target so the bigram ratios agree too —
            # DSIR weighs n-grams, not keywords: a doc using the marker
            # words in never-seen-in-target bigrams scores NEGATIVE
            # bigram terms (this fixture originally did, and the test
            # failed — behavior worth keeping pinned, see below)
            base += " quantum physics entanglement lattice quantum spin 1"
        raw_texts.append(base)
    target_texts = [
        f"quantum physics entanglement lattice quantum spin {i % 3}"
        for i in range(40)
    ]
    return _mk_docs(spark, raw_texts), _mk_docs(spark, target_texts)


def test_profile_matches_counter_replay(spark, corpora):
    raw, _ = corpora
    prof = {
        r["bucket"]: r["count"]
        for r in hashed_ngram_profile(raw, n_features=N_FEATURES).collect()
    }
    expected: Counter = Counter()
    for row in raw.collect():
        expected.update(gram_buckets(row["text"].split(), N_FEATURES, 2))
    assert prof == dict(expected)


def test_log_weights_replay_numpy_and_partition_invariant(spark, corpora):
    raw, target = corpora
    pr = profile_probs(hashed_ngram_profile(raw, n_features=N_FEATURES), N_FEATURES)
    pt = profile_probs(
        hashed_ngram_profile(target, n_features=N_FEATURES), N_FEATURES
    )
    ratio = log_ratio_vector(pt, pr)

    out = dsir_log_weights(raw, ratio).orderBy("doc_id").collect()
    for row in out:
        idx = gram_buckets(row["text"].split(), N_FEATURES, 2)
        expected = (
            float(np.add.reduceat(ratio[np.asarray(idx)], [0])[0]) if idx else 0.0
        )
        assert row["dsir_logw"] == expected  # bitwise, not approx

    again = (
        dsir_log_weights(raw.repartition(7), ratio).orderBy("doc_id").collect()
    )
    assert [r["dsir_logw"] for r in again] == [r["dsir_logw"] for r in out]


def test_planted_shift_selected(spark, corpora):
    """Marker documents must outweigh filler, and the resample must be
    dominated by them: the paper's behavioral claim on an unambiguous
    corpus."""
    raw, target = corpora
    pr = profile_probs(hashed_ngram_profile(raw, n_features=N_FEATURES), N_FEATURES)
    pt = profile_probs(
        hashed_ngram_profile(target, n_features=N_FEATURES), N_FEATURES
    )
    weighted = dsir_log_weights(raw, log_ratio_vector(pt, pr))
    rows = weighted.collect()
    marker_w = [r["dsir_logw"] for r in rows if "quantum" in r["text"]]
    filler_w = [r["dsir_logw"] for r in rows if "quantum" not in r["text"]]
    assert min(marker_w) > max(filler_w)

    picked = importance_resample(weighted, 20, seed=7).collect()
    assert len(picked) == 20
    n_marker = sum("quantum" in r["text"] for r in picked)
    assert n_marker >= 18  # weight gap is huge; Gumbel noise rarely flips 2+


def test_marker_words_in_foreign_bigrams_score_below_verbatim(spark, corpora):
    """The n-gram sensitivity pinned: a document using the marker WORDS
    in bigrams the target never uses gains unigram terms but pays
    negative bigram terms, so it must rank strictly below a verbatim
    phrase match — DSIR selects phrasing, not keyword presence."""
    raw, target = corpora
    pr = profile_probs(hashed_ngram_profile(raw, n_features=N_FEATURES), N_FEATURES)
    pt = profile_probs(
        hashed_ngram_profile(target, n_features=N_FEATURES), N_FEATURES
    )
    probe = _mk_docs(
        spark,
        [
            "quantum physics entanglement lattice quantum spin 1",  # verbatim
            "entanglement quantum lattice physics spin quantum 1",  # shuffled
        ],
    )
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(probe, log_ratio_vector(pt, pr)).collect()
    }
    assert w[0] > w[1]


def test_gumbel_draw_is_deterministic_expression(spark, corpora):
    """The sample must be exactly the driver-side replay of
    key = logw - log(-log(u)), u = (xxhash64(id, seed) mod 2^52 + 0.5)/2^52
    — same rows, same order, across repeated runs and repartitioning."""
    raw, target = corpora
    pr = profile_probs(hashed_ngram_profile(raw, n_features=N_FEATURES), N_FEATURES)
    pt = profile_probs(
        hashed_ngram_profile(target, n_features=N_FEATURES), N_FEATURES
    )
    weighted = dsir_log_weights(raw, log_ratio_vector(pt, pr))

    hashes = {
        r["doc_id"]: r["h"]
        for r in weighted.select(
            "doc_id", F.xxhash64("doc_id", F.lit(7)).alias("h")
        ).collect()
    }
    expected = []
    for r in weighted.collect():
        u = ((hashes[r["doc_id"]] % (1 << 52)) + 0.5) / float(1 << 52)
        expected.append((r["dsir_logw"] - math.log(-math.log(u)), -r["doc_id"]))
    expected_ids = [
        -neg for _, neg in sorted(expected, reverse=True)[:15]
    ]

    got = importance_resample(weighted, 15, seed=7)
    assert [r["doc_id"] for r in got.collect()] == expected_ids
    assert [
        r["doc_id"]
        for r in importance_resample(weighted.repartition(5), 15, seed=7).collect()
    ] == expected_ids


def test_dsir_scale_plan(spark, corpora):
    """Weight stage: one Arrow boundary, no Exchange. Resample:
    TakeOrderedAndProject, never a global Sort."""
    raw, _ = corpora
    ratio = np.zeros(N_FEATURES)
    weighted = dsir_log_weights(raw, ratio)
    plan = weighted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan and "BatchEvalPython" not in plan

    sampled = importance_resample(weighted, 10)
    splan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan


def test_validation_errors(spark, corpora):
    raw, _ = corpora
    with pytest.raises(ValueError, match="profile shapes"):
        log_ratio_vector(np.ones(4), np.ones(5))
    with pytest.raises(ValueError, match="n must be"):
        importance_resample(raw.withColumn("dsir_logw", F.lit(0.0)), 0)
