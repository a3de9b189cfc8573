"""Hard-negative mining (operators/similarity.py), streaming session
windows (streaming/pipeline.py), and HLL sketch mergeability."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.similarity import hard_negatives


@pytest.fixture(scope="module")
def labeled_vecs(spark):
    rows = [
        (1, [1.0, 0.0], 10),
        (2, [0.9, 0.1], 10),   # same label as 1 → never its negative
        (3, [0.8, 0.2], 20),   # different label, very similar → hard
        (4, [0.0, 1.0], 20),   # different label, far → easy
        (5, [1.0, 0.1], None),  # NULL label → excluded entirely
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_hard_negatives_excludes_same_label_and_null(spark, labeled_vecs):
    out = hard_negatives(
        labeled_vecs, labeled_vecs.filter("vec_id = 1"), k=10
    ).collect()
    ids = [r["neighbor_id"] for r in out]
    assert 2 not in ids, "same-label vector must not be a negative"
    assert 5 not in ids, "NULL-label vector cannot certify a negative"
    assert ids == [3, 4], "ranked by similarity: hard negative first"
    assert out[0]["sim"] > out[1]["sim"]
    assert all(r["q_label"] == 10 for r in out)
    assert [r["neighbor_label"] for r in out] == [20, 20]


def test_hard_negatives_null_label_query_dropped(spark, labeled_vecs):
    out = hard_negatives(
        labeled_vecs, labeled_vecs.filter("vec_id = 5"), k=10
    ).collect()
    assert out == []


# ------------------------------------------------- streaming sessions ---


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_session_stream_gap_semantics(spark, tmp_path):
    from cassandra_slow_queries_spark.streaming.pipeline import (
        read_fact_stream,
        run_stream_to_batch,
        session_stream,
    )

    # key 'a': events at 0, 4, 9 min (gaps < 5 min → one session);
    # 14:00 is EXACTLY 5 min after 9:00 → windows touch → Spark
    # coalesces (merge condition is <=, pinned here); 20:00 is 6 min
    # after 14:00 → strictly > gap → new session.
    # key 'b': single event.
    rows = [
        ("a", _ts(0)), ("a", _ts(4)), ("a", _ts(9)), ("a", _ts(14)),
        ("a", _ts(20)),
        ("b", _ts(2)),
    ]
    fact = spark.createDataFrame(
        [(ts, q, "0", 7) for q, ts in rows],
        "ts timestamp, query string, primary_key string, duration long",
    )
    d = str(tmp_path / "fact")
    fact.write.parquet(d)
    out = run_stream_to_batch(
        session_stream(read_fact_stream(spark, d), gap="5 minutes")
    ).collect()
    sess = {
        (r["query"], r["session_start"], r["session_end"]): r["cnt"]
        for r in out
    }
    assert sess == {
        ("a", "2024-01-01 00:00:00", "2024-01-01 00:19:00"): 4,
        ("a", "2024-01-01 00:20:00", "2024-01-01 00:25:00"): 1,
        ("b", "2024-01-01 00:02:00", "2024-01-01 00:07:00"): 1,
    }
    dur = {r["query"]: 0 for r in out}
    for r in out:
        dur[r["query"]] += r["duration"]
    assert dur == {"a": 35, "b": 7}


# -------------------------------------------------- HLL mergeability ---


def test_hll_sketch_union_matches_whole(spark):
    # the estimate from merged per-part sketches must equal the
    # estimate of one whole-corpus sketch: mergeability is exact,
    # only the cardinality estimate is approximate.
    df = spark.range(0, 10000).withColumn("part", F.col("id") % 7)
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est")
    ).collect()[0]["est"]
    merged = (
        df.groupBy("part")
        .agg(F.hll_sketch_agg("id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == whole
    assert abs(merged - 10000) / 10000 < 0.05
