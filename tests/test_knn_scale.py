"""Unit tests for kNN majority-vote classification
(operators/similarity.py:knn_classify) and per-group feature scaling
(operators/curation.py:scale_features); the embeddings/events catalog
entries are oracle-checked by test_entry_oracle.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.curation import scale_features
from cassandra_slow_queries_spark.operators.similarity import knn_classify


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_majority_and_tiebreak(spark):
    # query 0 at origin-ish; 2 neighbors labeled 1, 2 labeled 2 among
    # k=4 → tie 2-2 breaks to the SMALLER label 1
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 1),
            (2, [0.9, 0.1], 1),
            (3, [0.8, 0.2], 2),
            (4, [0.7, 0.3], 2),
            (5, [-1.0, 0.0], 9),  # far away: outside k=4
        ],
    )
    q = _vecs(spark, [(0, [1.0, 0.05], 7)])
    out = knn_classify(corpus, q, k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["q_id"] == 0
    assert r["predicted_label"] == 1
    assert r["votes"] == 2
    assert r["n_neighbors"] == 4


def test_knn_excludes_null_labels_and_self(spark):
    corpus = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 5),      # self for query 0: excluded
            (1, [0.99, 0.01], None),  # unlabeled: never a neighbor
            (2, [0.9, 0.1], 3),
            (3, [0.8, 0.2], 3),
        ],
    )
    q = _vecs(spark, [(0, [1.0, 0.0], 5)])
    r = knn_classify(corpus, q, k=2).collect()[0]
    assert r["predicted_label"] == 3
    assert r["n_neighbors"] == 2  # the NULL row did not occupy a slot


def test_scale_features_closed_form(spark):
    df = spark.createDataFrame(
        [(1, "g", 2), (2, "g", 4), (3, "g", 6), (4, "h", 5)],
        "id long, g string, x long",
    )
    out = {
        r["id"]: (r["zscore"], r["minmax"])
        for r in scale_features(df, "x", "g").collect()
    }
    sd = math.sqrt(((4 + 16 + 36) / 3) - 16.0)  # population std of 2,4,6
    assert out[1] == (round((2 - 4) / sd, 6), 0.0)
    assert out[2] == (0.0, 0.5)
    assert out[3] == (round((6 - 4) / sd, 6), 1.0)
    # single-row group: zero variance and zero span → both 0.0
    assert out[4] == (0.0, 0.0)


def test_scale_features_keeps_all_rows_and_columns(spark):
    df = spark.createDataFrame(
        [(i, "g", i % 3) for i in range(30)], "id long, g string, x long"
    )
    out = scale_features(df, "x", "g")
    assert out.count() == 30
    assert set(out.columns) == {"id", "g", "x", "zscore", "minmax"}
    # zscores of a finite group are bounded and mean ~0
    zs = [r["zscore"] for r in out.collect()]
    assert abs(sum(zs)) < 1e-3
    assert all(abs(z) < 5 for z in zs)


def test_scale_features_preserves_null_group_rows(spark):
    df = spark.createDataFrame(
        [(1, "g", 2), (2, None, 4), (3, None, 8)],
        "id long, g string, x long",
    )
    out = {r["id"]: r.asDict() for r in scale_features(df, "x", "g").collect()}
    # NULL group is its own group (null-safe join back): 3 rows survive
    assert set(out) == {1, 2, 3}
    assert out[2]["minmax"] == 0.0 and out[3]["minmax"] == 1.0


def test_scale_features_null_values_excluded_from_moments(spark):
    df = spark.createDataFrame(
        [(1, "g", 2), (2, "g", 4), (3, "g", None)],
        "id long, g string, x long",
    )
    out = {r["id"]: r.asDict() for r in scale_features(df, "x", "g").collect()}
    # moments over {2, 4}: mean 3, std 1 → zscores -1 and +1
    assert out[1]["zscore"] == -1.0 and out[2]["zscore"] == 1.0
    # the NULL-valued row passes through with NULL scaled columns
    assert out[3]["zscore"] is None and out[3]["minmax"] is None
