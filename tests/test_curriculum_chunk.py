"""Unit tests for curriculum quantile binning and overlapping-window
chunking (operators/curation.py); the documents-table entries are
oracle-checked by test_entry_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.curation import (
    chunk_documents,
    quantile_bins,
)


def test_quantile_bins_equi_depth(spark):
    # 8 distinct scores in one group → quartiles of 2 each
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(8)], "id long, g string, s double"
    )
    out = {r["id"]: r["bin"] for r in quantile_bins(df, "s", "g", 4).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}


def test_quantile_bins_ties_share_bin(spark):
    # all-equal scores: pct_rank 0 for every row → everyone in bin 0
    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(6)], "id long, g string, s double"
    )
    bins = {r["bin"] for r in quantile_bins(df, "s", "g", 4).collect()}
    assert bins == {0}


def test_quantile_bins_max_score_clamped(spark):
    # pct_rank 1.0 → floor(1.0*4)=4 must clamp to n_bins-1
    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 2.0)], "id long, g string, s double"
    )
    out = {r["id"]: r["bin"] for r in quantile_bins(df, "s", "g", 4).collect()}
    assert out == {1: 0, 2: 3}


def test_quantile_bins_groups_independent(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 100.0), (4, "b", 200.0)],
        "id long, g string, s double",
    )
    out = {r["id"]: r["bin"] for r in quantile_bins(df, "s", "g", 2).collect()}
    assert out == {1: 0, 2: 1, 3: 0, 4: 1}


def test_quantile_bins_rejects_zero_bins(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, g string, s double")
    with pytest.raises(ValueError):
        quantile_bins(df, "s", "g", 0)


def _chunks(spark, text, window, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_documents(df, "text", "doc_id", window, stride)
        .orderBy("pos")
        .collect()
    )
    return [(r["pos"], r["span"], r["n_words"]) for r in rows]


def test_chunk_overlap_windows_and_counts(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = _chunks(spark, text, window=4, stride=3)
    assert out == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]


def test_chunk_overlap_ragged_tail(spark):
    text = " ".join(f"w{i}" for i in range(11))
    out = _chunks(spark, text, window=4, stride=3)
    # last window starts at 9, only 2 words remain
    assert out[-1] == (3, "w9 w10", 2)
    # every word covered at least once
    covered = set()
    for _, span, _ in out:
        covered.update(span.split(" "))
    assert covered == {f"w{i}" for i in range(11)}


def test_chunk_short_doc_single_window(spark):
    assert _chunks(spark, "a b", window=10, stride=5) == [(0, "a b", 2)]
    # empty text behaves like str.split: one empty span
    assert _chunks(spark, "", window=10, stride=5) == [(0, "", 1)]


def test_chunk_stride_equals_window_matches_nonoverlapping(spark):
    from cassandra_slow_queries_spark.operators.dedup import word_chunk_spans

    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(13))) for i in range(5)],
        "doc_id long, text string",
    )
    a = {
        (r["id"], r["pos"], r["span"])
        for r in chunk_documents(df, "text", "doc_id", 4, 4).collect()
    }
    b = {
        (r["id"], r["pos"], r["span"])
        for r in word_chunk_spans(df, "text", "doc_id", 4).collect()
    }
    assert a == b


def test_chunk_rejects_gapping_stride(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", window_words=3, stride_words=4)


def _ts_rows(spark, secs):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(secs)], "id long, sec long"
    ).select("id", F.timestamp_seconds(F.col("sec")).alias("ts"))


def test_time_folds_expanding_windows(spark):
    from cassandra_slow_queries_spark.operators.timeseries import time_folds

    # 9 points at 0..8 s; 3 folds → 4 slices of width 2 s
    # cutoffs at 2, 4, 6; last fold valid window closes at 8 inclusive
    df = _ts_rows(spark, list(range(9)))
    out = time_folds(df, "ts", n_folds=3)
    by_fold = {}
    for r in out.collect():
        by_fold.setdefault(r["fold"], {"train": set(), "valid": set()})[
            r["role"]
        ].add(r["id"])
    assert by_fold[1]["train"] == {0, 1}
    assert by_fold[1]["valid"] == {2, 3}
    assert by_fold[2]["train"] == {0, 1, 2, 3}
    assert by_fold[2]["valid"] == {4, 5}
    assert by_fold[3]["train"] == {0, 1, 2, 3, 4, 5}
    # last fold's window closes INCLUSIVELY at the max timestamp
    assert by_fold[3]["valid"] == {6, 7, 8}


def test_time_folds_invariants(spark):
    import random

    from cassandra_slow_queries_spark.operators.timeseries import time_folds

    rng = random.Random(11)
    secs = sorted(rng.randrange(10_000) for _ in range(60))
    df = _ts_rows(spark, secs)
    out = time_folds(df, "ts", n_folds=4).collect()
    sec_of = dict(enumerate(secs))
    by_fold = {}
    for r in out:
        by_fold.setdefault(r["fold"], {"train": [], "valid": []})[
            r["role"]
        ].append(sec_of[r["id"]])
    prev_train = 0
    for fold in sorted(by_fold):
        tr, va = by_fold[fold]["train"], by_fold[fold]["valid"]
        # temporal safety: every train point strictly before every valid
        if tr and va:
            assert max(tr) < min(va)
        # expanding origin: training sets grow with the fold index
        assert len(tr) >= prev_train
        prev_train = len(tr)
    # every row at or after the first cutoff validates in exactly one
    # fold; the seed slice before it only trains
    width = (secs[-1] - secs[0]) * 1_000_000 // 5
    cutoff1 = secs[0] * 1_000_000 + width
    all_valid = [s for f in by_fold.values() for s in f["valid"]]
    expect_valid = [s for s in secs if s * 1_000_000 >= cutoff1]
    assert sorted(all_valid) == expect_valid


def test_time_folds_drops_unplaceable_rows(spark):
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.timeseries import time_folds

    df = _ts_rows(spark, list(range(9))).withColumn(
        "ts", F.when(F.col("id") != 4, F.col("ts"))
    )
    out = time_folds(df, "ts", n_folds=3).collect()
    # the NULL-ts row belongs to no fold on either side of any cutoff
    assert all(r["id"] != 4 for r in out)
    assert {r["id"] for r in out} == {0, 1, 2, 3, 5, 6, 7, 8}
