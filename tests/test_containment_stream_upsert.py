"""Containment pairs (operators/dedup.py) and the streaming CDC upsert
sink (streaming/pipeline.py:run_streaming_upsert)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.dedup import containment_pairs


def test_containment_sees_quote_jaccard_misses(spark):
    long_words = [f"w{i}" for i in range(40)]
    quote = " ".join(long_words[5:15])  # 10 words out of 40
    df = spark.createDataFrame(
        [
            (1, " ".join(long_words)),
            (2, quote),
            (3, "completely different text with other words entirely"),
        ],
        ["doc_id", "text"],
    )
    out = containment_pairs(
        df, "text", "doc_id", n=3, threshold=0.8, max_doc_freq=None
    ).collect()
    assert len(out) == 1
    p = out[0]
    assert (p["id_a"], p["id_b"]) == (1, 2)
    # every quote shingle is inside the source → containment exactly 1
    assert p["containment"] == 1.0
    assert p["size_b"] == 8  # 10 words → 8 distinct 3-shingles
    # Jaccard for the same pair is tiny — the asymmetric blind spot:
    # 8 shared / (38 + 8 - 8) union ≈ 0.21 < any sane jaccard cut
    assert p["n_common"] / (p["size_a"] + p["size_b"] - p["n_common"]) < 0.25


def test_containment_threshold_and_ordering(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d x y"), (3, "a b c d e f")],
        ["doc_id", "text"],
    )
    out = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            df, "text", "doc_id", n=3, threshold=0.5, max_doc_freq=None
        ).collect()
    }
    # identical docs: containment 1; (1,2) share 2 of 4 shingles = 0.5
    assert out[(1, 3)] == 1.0
    assert out[(1, 2)] == 0.5 and out[(2, 3)] == 0.5


# ---------------------------------------------------- streaming upsert ---


def _write_batch(spark, d, rows):
    spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, version long, payload string, "
        "deleted boolean",
    ).coalesce(1).write.mode("append").parquet(d)


def test_streaming_upsert_folds_and_tombstones(spark, tmp_path):
    from cassandra_slow_queries_spark.streaming.pipeline import (
        run_streaming_upsert,
    )

    t = datetime(2024, 1, 1)
    changes = str(tmp_path / "changes")
    # one file per micro-batch (maxFilesPerTrigger=1 below):
    # batch A: insert users 1, 2
    _write_batch(spark, changes, [
        (1, t, 1, "u1-v1", False), (2, t, 1, "u2-v1", False),
    ])
    # batch B: update user 1, DELETE user 2 (version 2 tombstone)
    _write_batch(spark, changes, [
        (1, t, 2, "u1-v2", False), (2, t, 2, None, True),
    ])
    # batch C: LATE arrival — an OLDER (version 0) event for deleted
    # user 2 and an older event for user 1. Neither may win: without
    # tombstone retention user 2 would resurrect here.
    _write_batch(spark, changes, [
        (1, t, 0, "u1-v0", False), (2, t, 0, "u2-v0", False),
    ])
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, version long, payload string, "
            "deleted boolean"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(changes)
    )
    final = run_streaming_upsert(
        stream,
        str(tmp_path / "snap"),
        keys=["user_id"],
        version_cols=["version"],
        tombstone_col="deleted",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = {r["user_id"]: r["payload"] for r in final.collect()}
    assert rows == {1: "u1-v2"}, (
        "deleted key must stay dead across later batches; "
        "latest payload must win"
    )
    # versioned state: one seedless initial + one version per batch
    import os

    versions = sorted(os.listdir(str(tmp_path / "snap")))
    assert versions == ["v=0", "v=1", "v=2"]
    # tombstone retained IN STATE (the whole point), filtered at read
    state = spark.read.parquet(str(tmp_path / "snap" / "v=2"))
    srows = {r["user_id"]: r["deleted"] for r in state.collect()}
    assert srows == {1: False, 2: True}


def test_upsert_ignores_uncommitted_snapshot_version(spark, tmp_path):
    from cassandra_slow_queries_spark.streaming.pipeline import (
        _latest_snapshot_version,
    )

    snap = tmp_path / "snap"
    (snap / "v=0").mkdir(parents=True)
    (snap / "v=0" / "_SUCCESS").touch()
    # v=1 crashed mid-write: directory exists, no _SUCCESS marker
    (snap / "v=1" / "_temporary").mkdir(parents=True)
    assert _latest_snapshot_version(str(snap)) == 0


def test_upsert_empty_stream_schema_matches_normal_path(spark, tmp_path):
    from cassandra_slow_queries_spark.streaming.pipeline import (
        run_streaming_upsert,
    )

    changes = tmp_path / "changes"
    changes.mkdir()
    stream = (
        spark.readStream.schema(
            "user_id long, version long, payload string, deleted boolean"
        )
        .parquet(str(changes))
    )
    final = run_streaming_upsert(
        stream,
        str(tmp_path / "snap"),
        keys=["user_id"],
        version_cols=["version"],
        tombstone_col="deleted",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert final.count() == 0
    assert "deleted" not in final.columns  # same schema as normal path


def test_upsert_checkpointed_restart_no_refold(spark, tmp_path):
    """A second run over the same checkpoint resumes from the committed
    offset: already-folded batches are not re-applied (no extra
    snapshot versions), new batches fold on top of the existing
    state."""
    from cassandra_slow_queries_spark.streaming.pipeline import (
        run_streaming_upsert,
    )

    t = datetime(2024, 1, 1)
    changes = str(tmp_path / "changes")
    snap, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    schema = (
        "user_id long, ts timestamp, version long, payload string, "
        "deleted boolean"
    )

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(changes)
        )

    def run():
        return run_streaming_upsert(
            stream(), snap, keys=["user_id"], version_cols=["version"],
            tombstone_col="deleted", checkpoint_dir=ckpt,
        )

    _write_batch(spark, changes, [(1, t, 1, "v1", False)])
    first = run()
    assert {r["payload"] for r in first.collect()} == {"v1"}
    import os

    n_versions_after_first = len(os.listdir(snap))

    # "restart": new file arrives, same checkpoint — only IT folds
    _write_batch(spark, changes, [(1, t, 2, "v2", False),
                                  (2, t, 1, "w1", False)])
    second = run()
    rows = {r["user_id"]: r["payload"] for r in second.collect()}
    assert rows == {1: "v2", 2: "w1"}
    assert len(os.listdir(snap)) == n_versions_after_first + 1, (
        "exactly one new snapshot version: the first batch must not "
        "re-fold after the restart"
    )


def test_upsert_version_committed_without_success_marker(spark, tmp_path):
    # marksuccessfuljobs=false deployments never write _SUCCESS: a
    # version with data files and no _temporary must still count as
    # committed (review finding: the marker-only gate silently lost
    # all prior state on such deployments)
    from cassandra_slow_queries_spark.streaming.pipeline import (
        _latest_snapshot_version,
    )

    snap = tmp_path / "snap"
    (snap / "v=0").mkdir(parents=True)
    (snap / "v=0" / "part-00000-abc.parquet").touch()
    (snap / "v=1" / "_temporary").mkdir(parents=True)  # crashed
    assert _latest_snapshot_version(str(snap)) == 0


def test_stream_sinks_released_across_repeated_runs(spark, tmp_path):
    """Session hygiene regression (r10): every finite-stream run used
    to leave its memory-sink table registered for the session lifetime,
    so a long-lived session (bench loop, notebook) accumulated every
    streaming result ever produced. release_stream_sink must leave
    ZERO stream_result_ temp views behind, run after run, while the
    returned frames stay independently readable."""
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.streaming.pipeline import (
        run_stream_to_batch,
    )

    src = str(tmp_path / "src")
    spark.range(0, 100).select(
        (F.col("id") % 7).alias("k")
    ).write.parquet(src)

    frames = []
    for _ in range(4):
        stream = spark.readStream.schema("k bigint").parquet(src)
        agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        frames.append(run_stream_to_batch(agg, output_mode="complete"))
    leftovers = [
        t.name
        for t in spark.catalog.listTables()
        if t.isTemporary and t.name.startswith("stream_result_")
    ]
    assert leftovers == [], leftovers
    # every run's result remains readable after its view was dropped
    for f in frames:
        assert f.count() == 7 and f.agg(F.sum("n")).collect()[0][0] == 100
