"""Bigram-LM perplexity scoring and BPE merge training (operators/lm.py,
operators/bpe.py): hand-computed closed-form checks on tiny corpora."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators import bpe
from cassandra_slow_queries_spark.operators.lm import (
    score_cross_entropy,
    train_bigram_lm,
)


# ---------------------------------------------------------------- LM ---


@pytest.fixture(scope="module")
def tiny_lm(spark):
    train = spark.createDataFrame(
        [(1, "a b a b")], ["doc_id", "text"]
    )
    return train_bigram_lm(train)


def test_lm_counts(tiny_lm):
    bi = {(r["x"], r["y"]): r["n_xy"] for r in tiny_lm.bigrams.collect()}
    ctx = {r["x"]: r["n_x"] for r in tiny_lm.contexts.collect()}
    assert bi == {("a", "b"): 2, ("b", "a"): 1}
    assert ctx == {"a": 2, "b": 1}
    assert tiny_lm.vocab.collect()[0]["v"] == 2


def test_lm_cross_entropy_closed_form(spark, tiny_lm):
    # "a b c": (a,b) seen → ln(5/6); (b,c) seen ctx, unseen bigram →
    # ln(1/4). "c x": unseen ctx → uniform ln(1/2).
    score = spark.createDataFrame(
        [(10, "a b c"), (11, "c x")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in score_cross_entropy(score, tiny_lm).collect()
    }
    exp10 = -(
        round(math.log(5.0 / 6.0), 9) + round(math.log(1.0 / 4.0), 9)
    ) / 2
    exp11 = -round(math.log(1.0 / 2.0), 9)
    assert out[10]["n_bi"] == 2
    assert out[10]["xent"] == pytest.approx(round(exp10, 6), abs=1e-9)
    assert out[11]["n_bi"] == 1
    assert out[11]["xent"] == pytest.approx(round(exp11, 6), abs=1e-9)


def test_lm_min_count_floors_bigrams_not_denominators(spark):
    train = spark.createDataFrame(
        [(1, "a b a b a c")], ["doc_id", "text"]
    )
    lm = train_bigram_lm(train, min_count=2)
    bi = {(r["x"], r["y"]): r["n_xy"] for r in lm.bigrams.collect()}
    ctx = {r["x"]: r["n_x"] for r in lm.contexts.collect()}
    # (b,a):2 and (a,b):2 survive; (a,c):1 floored away...
    assert bi == {("a", "b"): 2, ("b", "a"): 2}
    # ...but the context count for 'a' still includes it (exact
    # denominators), and vocab still counts 'c'.
    assert ctx["a"] == 3
    assert lm.vocab.collect()[0]["v"] == 3


def test_lm_single_token_docs_absent(spark, tiny_lm):
    score = spark.createDataFrame(
        [(20, "a"), (21, "a b")], ["doc_id", "text"]
    )
    out = score_cross_entropy(score, tiny_lm).collect()
    assert {r["doc_id"] for r in out} == {21}


# --------------------------------------------------------------- BPE ---


def test_bpe_initial_symbols_and_pair_counts(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower")], ["doc_id", "text"]
    )
    vocab = bpe.word_counts(docs, "text").withColumn(
        "symbols", bpe.initial_symbols("word")
    )
    rows = {r["word"]: (r["n_word"], r["symbols"]) for r in vocab.collect()}
    assert rows["low"] == (2, ["l", "o", "w</w>"])
    assert rows["lower"] == (1, ["l", "o", "w", "e", "r</w>"])
    counts = {
        (r["a"], r["b"]): r["n_pair"]
        for r in bpe.pair_counts(vocab).collect()
    }
    # (l,o): 2 from 'low' + 1 from 'lower' = 3; (o,w</w>): 2.
    assert counts[("l", "o")] == 3
    assert counts[("o", "w</w>")] == 2
    assert counts[("o", "w")] == 1


def test_bpe_apply_merge_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], ["symbols"])
    out = df.select(
        bpe.apply_merge("symbols", "a", "a").alias("m")
    ).collect()[0]["m"]
    assert out == ["aa", "a"]


def test_bpe_train_merges_classic_corpus(spark):
    # 'low'×5 'lowest'×2: first merge must be (l,o) with count 7, then
    # (lo,w</w>) 5 vs (lo,w) 2 → (lo, w</w>).
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lowest"] * 2))], ["doc_id", "text"]
    )
    merges = bpe.train_bpe_merges(docs, n_merges=2)
    assert merges[0][:2] == ("l", "o") and merges[0][2] == 7
    assert merges[1][:2] == ("lo", "w</w>") and merges[1][2] == 5


def test_bpe_train_stops_when_dry(spark):
    docs = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    # pairs: (a, b</w>) once; with min_pair_count=2 nothing qualifies.
    merges = bpe.train_bpe_merges(docs, 5, min_pair_count=2)
    assert merges == []
    # unbounded: 1 merge then the word is a single symbol → dry.
    merges = bpe.train_bpe_merges(docs, 5)
    assert merges == [("a", "b</w>", 1)]


def test_bpe_encode_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lowest"] * 2))], ["doc_id", "text"]
    )
    merges = bpe.train_bpe_merges(docs, n_merges=3)
    enc = bpe.encode(docs, merges, "text")
    toks = enc.collect()[0]["bpe_tokens"]
    # 'low' → ['low</w>'] after 3 merges ((l,o),(lo,w</w>),(lo,w) or
    # similar); every word's symbols concatenate back to word+EOW.
    text = "".join(toks).replace(bpe.EOW, " ").strip()
    assert text == " ".join(["low"] * 5 + ["lowest"] * 2)


# ------------------------------------------------------- determinism ---


def test_bpe_top_pair_tiebreak(spark):
    df = spark.createDataFrame(
        [("b", "c", 5), ("a", "z", 5), ("a", "b", 5), ("z", "z", 4)],
        ["a", "b", "n_pair"],
    )
    assert bpe.top_pair(df) == ("a", "b", 5)


def test_lm_empty_document_survives(spark, tiny_lm):
    # one blank row in a corpus must not kill training or scoring
    # (slice length -1 regression: size([])-1)
    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, ""), (3, "   "), (4, None)],
        ["doc_id", "text"],
    )
    lm = train_bigram_lm(corpus)
    assert lm.vocab.collect()[0]["v"] == 2
    out = score_cross_entropy(corpus, tiny_lm).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_bpe_backslash_symbols(spark):
    # merge symbols containing backslashes must survive SQL
    # interpolation (quote-only escaping makes '\' + "'" malformed SQL)
    docs = spark.createDataFrame(
        [(1, "c:\\tmp c:\\tmp c:\\tmp o'k o'k")], ["doc_id", "text"]
    )
    merges = bpe.train_bpe_merges(docs, n_merges=8)
    assert merges, "training must not raise ParseException"
    enc = bpe.encode(docs, merges, "text").collect()[0]["bpe_tokens"]
    assert "".join(enc).replace(bpe.EOW, " ").strip() == \
        "c:\\tmp c:\\tmp c:\\tmp o'k o'k"


def test_bpe_encode_engine_parity(spark):
    """The Arrow encoder (auto-picked past 32 merges) must agree with
    the expression fold token-for-token — including NULL text, empty
    text, and words unseen in training."""
    corpus = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lowest"] * 2 + ["newer"] * 3))],
        ["doc_id", "text"],
    )
    merges = bpe.train_bpe_merges(corpus, n_merges=6)
    assert len(merges) >= 4
    held_out = spark.createDataFrame(
        [
            (1, "low lowest slower new newest"),
            (2, None),
            (3, ""),
            (4, "zzz low zzz"),
        ],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["bpe_tokens"]
         for r in bpe.encode(held_out, merges, engine="expr").collect()}
    b = {r["doc_id"]: r["bpe_tokens"]
         for r in bpe.encode(held_out, merges, engine="arrow").collect()}
    assert a == b
    assert a[2] is None and a[3] == []
    # roundtrip through the arrow path too
    text = "".join(b[1]).replace(bpe.EOW, " ").strip()
    assert text == "low lowest slower new newest"
    with pytest.raises(ValueError, match="unknown engine"):
        bpe.encode(held_out, merges, engine="gpu")


def test_bpe_encode_arrow_adversarial_table_parity(spark):
    """Sequential-fold equivalence must hold for ARBITRARY merge
    tables, not just trained ones — e.g. a later merge creating an
    earlier merge's pair must NOT be re-merged by either engine."""
    docs = spark.createDataFrame(
        [(1, "aab aaa baba")], "doc_id long, text string"
    )
    # (b, a) fires inside 'baba'; the later (a, ba) then creates a
    # fresh adjacency for the EARLIER pair which must stay unmerged.
    merges = [("b", "a", 0), ("a", "ba", 0), ("aa", f"b{bpe.EOW}", 0)]
    a = bpe.encode(docs, merges, engine="expr").collect()[0]["bpe_tokens"]
    b = bpe.encode(docs, merges, engine="arrow").collect()[0]["bpe_tokens"]
    assert a == b
