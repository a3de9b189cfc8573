"""Tier-2 streaming equivalence (SURVEY.md §5.5) + J5 endpoint enrichment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.endpoints import (
    attach_endpoints,
    endpoints_report,
    fake_endpoints,
)
from cassandra_slow_queries_spark.streaming.pipeline import (
    read_fact_stream,
    run_stream_to_batch,
    run_volume_top_stream,
    volume_stream,
)


@pytest.fixture(scope="module")
def fact_dir(spark, tmp_path_factory):
    rows = []
    for minute in range(3):
        for i in range(4):
            rows.append(
                (f"2026-08-13 05:0{minute}:{10 + i}", f"q{i % 2}", str(i), 100 + i)
            )
    df = spark.createDataFrame(
        rows, "ts_s string, query string, primary_key string, duration long"
    ).select(F.to_timestamp("ts_s").alias("ts"), "query", "primary_key", "duration")
    out = str(tmp_path_factory.mktemp("facts"))
    df.write.mode("overwrite").parquet(out)
    return out


def test_stream_volume_equals_batch(spark, fact_dir):
    stream = read_fact_stream(spark, fact_dir)
    got = run_stream_to_batch(volume_stream(stream)).collect()
    batch = spark.read.parquet(fact_dir)
    expected = (
        batch.groupBy(
            F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm").alias(
                "minute"
            )
        )
        .agg(F.count("*").alias("cnt"), F.sum("duration").alias("duration"))
        .withColumn(
            "avg_duration",
            F.floor(F.col("duration") / F.col("cnt")).cast("long"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    assert all(r.avg_duration == 101 for r in got)  # (100+101+102+103)/4 floor


def test_stream_volume_top_ranks_within_window(spark, fact_dir):
    stream = read_fact_stream(spark, fact_dir)
    got = run_volume_top_stream(stream, k=1, order_by="duration").collect()
    # cells key on (minute, query, pk) → four cnt=1 cells per minute; the
    # per-minute winner is (q1, pk "3", duration 103)
    assert len(got) == 3
    assert all(
        r.query == "q1" and r.primary_key == "3" and r.duration == 103 for r in got
    )


def test_stream_watermarked_plan_builds(spark, fact_dir):
    """Watermarked variant must remain a valid streaming aggregation
    (state eviction path for unbounded sources)."""
    stream = read_fact_stream(spark, fact_dir)
    agg = volume_stream(stream, watermark="10 minutes")
    assert agg.isStreaming
    got = run_stream_to_batch(agg)
    assert got.count() == 3


def test_streaming_production_parse(spark, tmp_path):
    """The full parse_messages pipeline (incl. the pushdown barrier and
    stream-static broadcast joins) must run under readStream and equal
    the batch result."""
    import pandas as pd

    from cassandra_slow_queries_spark.config import AnalysisConfig
    from cassandra_slow_queries_spark.plans.pipeline import parse_messages

    rows = [
        {
            "ts_raw": f"2026-08-13T05:00:{i:02d}.000000Z",
            "message": (
                f"INFO Query too slow, took {100 + i} ms: [1 bound values] "
                f"SELECT * FROM ks1.t1 WHERE k=? LIMIT 1; [k:'v{i % 2}']"
            ),
            "tags": ["prod"],
        }
        for i in range(20)
    ]
    d = str(tmp_path / "raw")
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(d)
    cfg = AnalysisConfig(
        min_count=1,
        schema={"ks1": {"t1": {"primary_key": ["k"], "clustering_key": []}}},
        tags={"prod": "ks1"},
    )
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    fact_stream = parse_messages(stream, spark, cfg)
    assert fact_stream.isStreaming
    got = run_stream_to_batch(volume_stream(fact_stream)).collect()
    batch_fact = parse_messages(static, spark, cfg)
    expected_rows = batch_fact.count()
    assert sum(r.cnt for r in got) == expected_rows == 20
    pks = {r.primary_key for r in batch_fact.collect()}
    assert pks == {"v0", "v1"}


def test_append_mode_topk_closed_windows_once(spark, tmp_path):
    """Watermark + append-mode top-K: each closed window is emitted
    exactly once with its COMPLETE population, late data beyond the
    watermark is dropped, and windows still open at end-of-stream are
    held back — the unbounded-source contract complete mode can't give.
    """
    import os
    import time

    from cassandra_slow_queries_spark.streaming.pipeline import (
        run_volume_top_stream_append,
    )

    d = str(tmp_path / "facts")
    os.makedirs(d)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "ts_s string, query string, primary_key string, duration long"
        ).select(
            F.to_timestamp("ts_s").alias("ts"), "query", "primary_key", "duration"
        )
        sub = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        # move the data file into the stream dir with a controlled mtime so
        # the file source processes files in the intended order
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, name + ".parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = time.time()
    write_file(
        "f1",
        [
            ("2026-08-13 10:00:30", "q0", "a", 100),
            ("2026-08-13 10:00:40", "q1", "b", 200),
            ("2026-08-13 10:01:30", "q0", "a", 110),
        ],
        t0 - 300,
    )
    write_file("f2", [("2026-08-13 10:04:50", "q0", "a", 120)], t0 - 200)
    # f3 advances the watermark past 10:01/10:00 → they close and emit
    write_file("f3", [("2026-08-13 10:07:50", "q1", "b", 130)], t0 - 100)
    # f4 arrives AFTER the 10:01 window was evicted; its late row must be
    # dropped by the watermark filter, not resurrect the window (Spark
    # applies the late filter with the previous batch's watermark, which
    # is already 10:05:50 here)
    write_file(
        "f4",
        [
            ("2026-08-13 10:08:50", "q0", "a", 140),
            ("2026-08-13 10:01:55", "q0", "a", 999),
        ],
        t0 - 50,
    )

    static = spark.read.parquet(d)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = run_volume_top_stream_append(stream, k=5, watermark="2 minutes")
    rows = got.collect()
    by_minute: dict[str, list] = {}
    for r in rows:
        by_minute.setdefault(r.minute, []).append(r)

    # exactly-once: no minute appears in two different emit batches
    for minute, rs in by_minute.items():
        assert len({r._batch_id for r in rs}) == 1, f"{minute} emitted twice"
    # closed windows (end <= final watermark 10:05:50) are out; the
    # 10:07 window is still open and held back
    assert "2026-08-13 10:07" not in by_minute
    assert {"2026-08-13 10:00", "2026-08-13 10:01", "2026-08-13 10:04"} <= set(
        by_minute
    )
    # the late 999-duration row was dropped, not merged into 10:01
    cells_0101 = {(r.query, r.primary_key, r.cnt, r.duration) for r in by_minute["2026-08-13 10:01"]}
    assert cells_0101 == {("q0", "a", 1, 110)}
    # complete population for 10:00 (both cells of the window)
    cells_1000 = {(r.query, r.cnt, r.duration) for r in by_minute["2026-08-13 10:00"]}
    assert cells_1000 == {("q0", 1, 100), ("q1", 1, 200)}


def test_stateful_vectorized_fold_matches_sequential():
    """Closed-form batch EMA must equal the sequential per-row fold."""
    from cassandra_slow_queries_spark.streaming.stateful import _fold_ema

    durs = [100.0, 50.0, 200.0, 10.0, 170.0]
    for alpha in (0.2, 0.5, 0.9):
        seq = None
        for dur in durs:
            seq = dur if seq is None else alpha * dur + (1 - alpha) * seq
        vec = _fold_ema(None, durs, alpha)
        assert abs(vec - seq) < 1e-9
        # split across two "batches" — state carries between them
        vec2 = _fold_ema(_fold_ema(None, durs[:2], alpha), durs[2:], alpha)
        assert abs(vec2 - seq) < 1e-9
    assert _fold_ema(None, [], 0.5) is None
    assert _fold_ema(42.0, [], 0.5) == 42.0


class _StubState:
    """Minimal GroupState stand-in for unit-testing the pure-Python
    update function (the real one only exists inside a running query)."""

    def __init__(self, value=None, timed_out=False, now_ms=1_000):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None
        self.now_ms = now_ms

    def getCurrentProcessingTimeMs(self):
        return self.now_ms

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_stateful_timeout_eviction_branch():
    """hasTimedOut → emit final non-bursting row, remove state; normal
    path with a timeout configured → re-arm the timeout each batch."""
    import pandas as pd

    from cassandra_slow_queries_spark.streaming.stateful import _update

    st = _StubState(value=(7, 123.5, 3), timed_out=True, now_ms=5_000)
    [out] = list(_update(("q0",), iter([]), st, 0.5, 5, 60_000))
    assert st.removed
    assert out.n_events.iloc[0] == 7 and out.bursting.iloc[0] == 0
    assert out.ema_duration.iloc[0] == 123.5
    assert out.emit_seq.iloc[0] == 4  # the eviction row outranks update 3
    assert out.emit_ms.iloc[0] == 5_000  # stamped with the batch time

    st2 = _StubState()
    batch = pd.DataFrame({"ts": [1, 2], "duration": [100, 200]})
    [out2] = list(_update(("q1",), iter([batch]), st2, 0.5, 2, 60_000))
    assert st2.timeout_set == 60_000
    assert out2.n_events.iloc[0] == 2 and out2.bursting.iloc[0] == 1
    # seed 100, then 0.5·200 + 0.5·100
    assert out2.ema_duration.iloc[0] == 150.0
    assert out2.emit_seq.iloc[0] == 1
    assert out2.emit_ms.iloc[0] == 1_000


def test_stateful_final_pick_survives_eviction_rearrival(spark):
    """Regression (r10 ADVICE): a key evicted by ProcessingTimeTimeout
    restarts emit_seq at 1 on re-arrival, so a max-emit_seq pick would
    return the stale pre-eviction row whenever the old epoch emitted
    more rows than the new one. final_emissions orders by (emit_ms,
    emit_seq) — the batch clock is monotonic across epochs — so the
    post-re-arrival row must win; a duplicate emit_seq across epochs
    must not make the pick nondeterministic."""
    from cassandra_slow_queries_spark.streaming.stateful import (
        final_emissions,
    )

    emissions = spark.createDataFrame(
        [
            # epoch 1: three updates then the eviction row (seq 1..4)
            ("q", 10, 100.0, 0, 1, 1_000),
            ("q", 20, 110.0, 0, 2, 2_000),
            ("q", 30, 120.0, 0, 3, 3_000),
            ("q", 30, 120.0, 0, 4, 63_000),  # eviction re-emit
            # epoch 2: re-arrival — seq restarts at 1, duplicating epoch
            # 1's seq values, with fewer emissions than epoch 1
            ("q", 5, 200.0, 1, 1, 70_000),
            # control key: single epoch, max-seq == max-(ms,seq)
            ("r", 7, 50.0, 0, 1, 1_000),
            ("r", 9, 60.0, 0, 2, 2_000),
        ],
        schema="query string, n_events long, ema_duration double, "
        "bursting long, emit_seq long, emit_ms long",
    )
    out = {
        r["query"]: r for r in final_emissions(emissions).collect()
    }
    assert out["q"]["n_events"] == 5  # post-re-arrival row, NOT seq 4
    assert out["q"]["ema_duration"] == 200.0 and out["q"]["bursting"] == 1
    assert out["r"]["n_events"] == 9
    assert "emit_seq" not in out["q"].asDict() and "emit_ms" not in out["q"].asDict()


def test_stateful_burst_with_processing_timeout_runs(spark, fact_dir):
    """ProcessingTimeTimeout variant builds a valid stateful streaming
    plan and makes progress under a live trigger. (AvailableNow never
    terminates with processing-time timeouts — verified empirically — so
    the query is stopped explicitly after its first committed batch.)"""
    import tempfile
    import time

    from cassandra_slow_queries_spark.streaming.stateful import (
        burst_state_stream,
    )

    stream = read_fact_stream(spark, fact_dir)
    out = burst_state_stream(
        stream, alpha=0.5, burst_threshold=6, idle_timeout_ms=60_000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("burst_timeout_smoke")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bt_ckpt_"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(1)
        rows = spark.table("burst_timeout_smoke").collect()
        assert {r.query for r in rows} == {"q0", "q1"}
        assert all(r.n_events == 6 for r in rows)
    finally:
        q.stop()


def test_attach_endpoints_matches_driver_math(spark):
    df = spark.createDataFrame(
        [("ks1", "cf1", "pk1"), ("ks2", "cf2", "pk2")],
        "keyspace string, column_family string, primary_key string",
    )
    rows = attach_endpoints(df, provider="fake", n_nodes=6, rf=3).collect()
    for r in rows:
        assert r.endpoints == fake_endpoints(
            r.keyspace, r.column_family, r.primary_key, 6, 3
        )
        assert len(r.endpoints) == 3
        assert all(e.startswith("node") for e in r.endpoints)


def test_endpoints_report_fixed_columns(spark):
    df = spark.createDataFrame(
        [("ks1", "cf1", "pk1")],
        "keyspace string, column_family string, primary_key string",
    )
    report = endpoints_report(attach_endpoints(df), max_endpoints=6)
    assert [c for c in report.columns if c.startswith("Endpoint")] == [
        f"Endpoint{i}" for i in range(6)
    ]
    [row] = report.collect()
    assert row.Endpoint3 is None  # rf=3 → slots 3-5 empty


def test_nodetool_provider_is_gated(spark):
    """Without nodetool on executor PATH the real provider fails loudly
    (subprocess launch error surfaced through the Python worker), never
    silently; unknown providers are rejected at plan time."""
    df = spark.createDataFrame(
        [("ks1", "cf1", "pk1")],
        "keyspace string, column_family string, primary_key string",
    )
    with pytest.raises(Exception, match="nodetool|No such file|NotFound"):
        attach_endpoints(df, provider="nodetool").collect()
    with pytest.raises(ValueError, match="unknown provider"):
        attach_endpoints(df, provider="bogus")


def test_stateful_burst_detection(spark, fact_dir):
    """applyInPandasWithState: running count + EMA carried across
    micro-batches; final state snapshot per key."""
    from cassandra_slow_queries_spark.streaming.stateful import (
        run_burst_detection,
    )

    stream = read_fact_stream(spark, fact_dir)
    out = run_burst_detection(stream, alpha=0.5, burst_threshold=6).collect()
    by_q = {r.query: r for r in out}
    # fixture: 3 minutes x 4 events, q0/q1 alternate -> 6 events each
    assert by_q["q0"].n_events == 6 and by_q["q1"].n_events == 6
    assert by_q["q0"].bursting == 1 and by_q["q1"].bursting == 1
    assert by_q["q0"].ema_duration > 0


def test_filter_pks_spanning_nodes(spark):
    """Reference TODO:70 — only PKs whose replica set covers every
    whitelisted node survive; subset/overlap is not enough."""
    from cassandra_slow_queries_spark.operators.endpoints import (
        filter_pks_spanning_nodes,
    )

    df = spark.createDataFrame(
        [(f"ks1", "cf1", f"pk{i}") for i in range(64)],
        "keyspace string, column_family string, primary_key string",
    )
    enriched = attach_endpoints(df, provider="fake", n_nodes=6, rf=3)
    want = ["node1", "node2"]
    kept = filter_pks_spanning_nodes(enriched, want).collect()
    assert len(kept) > 0
    for r in kept:
        assert set(want) <= set(r.endpoints)
    # complement check: every dropped row misses at least one wanted node
    dropped = enriched.count() - len(kept)
    missing = enriched.filter(
        ~(F.array_contains("endpoints", "node1") & F.array_contains("endpoints", "node2"))
    ).count()
    assert dropped == missing
    # spanning an empty whitelist keeps everything
    assert filter_pks_spanning_nodes(enriched, []).count() == 64


def test_stream_dedup_keys_drops_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark ingestion dedup: repeated
    (bucket, query, pk) arrivals within the horizon emit exactly once;
    distinct keys all survive."""
    from cassandra_slow_queries_spark.streaming.pipeline import (
        distinct_keys_stream,
        run_stream_to_batch,
    )

    rows = []
    for rep in range(5):  # 5 duplicate arrivals of the same keys
        for i in range(3):
            rows.append((f"2026-08-13 05:00:{10 + rep}", f"q{i}", str(i), 100))
    rows.append(("2026-08-13 06:00:01", "q0", "0", 100))  # next hour bucket
    df = spark.createDataFrame(
        rows, "ts_s string, query string, primary_key string, duration long"
    ).select(F.to_timestamp("ts_s").alias("ts"), "query", "primary_key", "duration")
    out = str(tmp_path / "facts")
    df.write.mode("overwrite").parquet(out)
    stream = read_fact_stream(spark, out)
    got = sorted(
        (str(r.bucket), r.query, r.primary_key)
        for r in run_stream_to_batch(
            distinct_keys_stream(stream), output_mode="append"
        ).collect()
    )
    assert got == [
        ("2026-08-13 05:00:00", "q0", "0"),
        ("2026-08-13 05:00:00", "q1", "1"),
        ("2026-08-13 05:00:00", "q2", "2"),
        ("2026-08-13 06:00:00", "q0", "0"),
    ]


def test_stream_dedup_checkpoint_restart_no_reemit(spark, tmp_path):
    """Checkpointed restart: the dedup state lives in the checkpoint, so
    a second run over NEW files must not re-emit keys already emitted in
    the first run (within the watermark horizon) — the exactly-once
    resume property a 24/7 intake job depends on."""
    from cassandra_slow_queries_spark.streaming.pipeline import (
        distinct_keys_stream,
    )

    src = tmp_path / "facts"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, rows):
        df = spark.createDataFrame(
            rows, "ts_s string, query string, primary_key string, duration long"
        ).select(
            F.to_timestamp("ts_s").alias("ts"), "query", "primary_key", "duration"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))

    def run_once():
        stream = read_fact_stream(spark, f"{src}/*")
        q = (
            distinct_keys_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1", [("2026-08-13 05:00:10", "q0", "0", 100),
                       ("2026-08-13 05:00:11", "q1", "1", 100)])
    run_once()
    first = spark.read.parquet(sink).count()
    assert first == 2
    # second batch: one repeat of (q0, 0) in the same hour + one new key,
    # timestamps within the 90-minute horizon of batch 1
    write_batch("b2", [("2026-08-13 05:30:00", "q0", "0", 100),
                       ("2026-08-13 05:30:01", "q2", "2", 100)])
    run_once()
    rows = sorted(
        (str(r.bucket), r.query, r.primary_key)
        for r in spark.read.parquet(sink).collect()
    )
    assert rows == [
        ("2026-08-13 05:00:00", "q0", "0"),
        ("2026-08-13 05:00:00", "q1", "1"),
        ("2026-08-13 05:00:00", "q2", "2"),
    ]


def test_windowed_agg_checkpoint_restart_append_semantics(spark, tmp_path):
    """Append-mode watermarked aggregation across a checkpointed restart:
    a window emits exactly once (when the watermark passes its end), a
    restart does not re-emit already-closed windows, and late data for an
    emitted window is dropped rather than double-counted."""
    from cassandra_slow_queries_spark.streaming.pipeline import volume_stream

    src = tmp_path / "facts"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, rows):
        df = spark.createDataFrame(
            rows, "ts_s string, query string, primary_key string, duration long"
        ).select(
            F.to_timestamp("ts_s").alias("ts"), "query", "primary_key", "duration"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))

    def run_once():
        stream = read_fact_stream(spark, f"{src}/*")
        q = (
            volume_stream(stream, window="1 hour", watermark="90 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase 1: hours 5, 6, 7 → watermark 07:30-90m = 06:00 → only the
    # hour-5 window is closed and emitted
    write_batch("b1", [
        ("2026-08-13 05:10:00", "q", "0", 10),
        ("2026-08-13 05:20:00", "q", "0", 20),
        ("2026-08-13 06:10:00", "q", "0", 30),
        ("2026-08-13 07:30:00", "q", "0", 40),
    ])
    run_once()
    p1 = {(r.minute, r.cnt, r.duration) for r in spark.read.parquet(sink).collect()}
    assert p1 == {("2026-08-13 05:00", 2, 30)}
    # phase 2: hour 9 advances the watermark to 08:00 (closing windows 6
    # and 7) and a LATE hour-5 event arrives behind the watermark
    write_batch("b2", [
        ("2026-08-13 09:30:00", "q", "0", 50),
        ("2026-08-13 05:40:00", "q", "0", 999),  # late: window already emitted
    ])
    run_once()
    p2 = {(r.minute, r.cnt, r.duration) for r in spark.read.parquet(sink).collect()}
    assert p2 == {
        ("2026-08-13 05:00", 2, 30),   # NOT re-emitted, late row dropped
        ("2026-08-13 06:00", 1, 30),
        ("2026-08-13 07:00", 1, 40),
    }


def test_nodetool_endpoints_subprocess_shape(tmp_path, monkeypatch):
    """The real nodetool provider's call + parse shape, driven against a
    fake `nodetool` executable on PATH: argv order matches the reference
    (getendpoints <ks> <cf> <pk>), one endpoint per non-blank stdout
    line, whitespace stripped, failures raise."""
    import os
    import stat

    from cassandra_slow_queries_spark.operators.endpoints import (
        nodetool_endpoints,
    )

    fake = tmp_path / "nodetool"
    fake.write_text(
        "#!/bin/sh\n"
        'if [ "$1" != "getendpoints" ]; then exit 2; fi\n'
        'if [ "$4" = "boom" ]; then exit 1; fi\n'
        'echo "10.0.0.1"\n'
        "echo\n"
        'echo "  10.0.0.2  "\n'
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    assert nodetool_endpoints("ks1", "cf1", "pk1") == ["10.0.0.1", "10.0.0.2"]
    import subprocess

    with pytest.raises(subprocess.CalledProcessError):
        nodetool_endpoints("ks1", "cf1", "boom")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream join over a finite directory equals
    the batch interval join, pairs only within [ts, ts+interval], and
    the physical plan is a symmetric hash join with state watermarks."""
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.streaming.pipeline import (
        read_fact_stream,
        run_stream_to_batch,
        stream_stream_interval_join,
    )

    rows = [
        # user 1: view at t0, clicks at +30min (in) and +7h (out)
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:30:00", "click"),
        (1, "2024-01-01 07:00:00", "click"),
        # user 2: click BEFORE the view — never matches
        (2, "2024-01-01 01:00:00", "click"),
        (2, "2024-01-01 02:00:00", "view"),
        # user 3: two views share one click (both windows cover it)
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 03:00:00", "view"),
        (3, "2024-01-01 05:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    d = str(tmp_path / "events")
    df.write.parquet(d)

    views = read_fact_stream(spark, d).filter("event_type = 'view'")
    clicks = read_fact_stream(spark, d).filter("event_type = 'click'")
    joined = stream_stream_interval_join(
        views, clicks, on="user_id", interval="6 hours", watermark="12 hours"
    )
    got = sorted(
        (r["user_id"], str(r["l_ts"]), str(r["r_ts"]))
        for r in run_stream_to_batch(joined, output_mode="append").collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:30:00"),
        (3, "2024-01-01 00:00:00", "2024-01-01 05:00:00"),
        (3, "2024-01-01 03:00:00", "2024-01-01 05:00:00"),
    ]
    explained = joined._jdf.queryExecution().analyzed().toString()
    assert "watermark" in explained.lower()


def test_sliding_stream_each_event_in_two_windows(spark, fact_dir):
    from cassandra_slow_queries_spark.streaming.pipeline import (
        sliding_volume_stream,
    )

    stream = read_fact_stream(spark, fact_dir)
    got = run_stream_to_batch(
        sliding_volume_stream(stream, window="2 hours", slide="1 hour")
    ).collect()
    batch = spark.read.parquet(fact_dir)
    n_events = batch.count()
    # overlap factor 2: total count across windows is exactly 2x events
    assert sum(r.cnt for r in got) == 2 * n_events
    # every event at 05:0x lands in the 04:00 and 05:00 window starts
    buckets = {r.bucket for r in got}
    assert buckets == {"2026-08-13 04:00", "2026-08-13 05:00"}
    per_bucket = {}
    for r in got:
        per_bucket[r.bucket] = per_bucket.get(r.bucket, 0) + r.cnt
    assert per_bucket["2026-08-13 04:00"] == n_events
    assert per_bucket["2026-08-13 05:00"] == n_events


def test_stream_stream_left_outer_emission_semantics(spark, tmp_path):
    """Outer null rows emit only after the watermark CLOSES a left
    row's match window — and never for rows whose window is still open
    when the stream ends (no end-of-stream flush)."""
    from datetime import datetime

    from cassandra_slow_queries_spark.streaming.pipeline import (
        stream_stream_interval_join,
    )

    def ts(h):
        return datetime(2024, 1, 1, h)

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    schema = "user_id long, ts timestamp"
    # batch 1 files: left events early; a matching right for user 1
    spark.createDataFrame(
        [(1, ts(0)), (2, ts(0))], schema
    ).coalesce(1).write.mode("append").parquet(ldir)
    spark.createDataFrame([(1, ts(1))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(rdir)
    # batch 2 files: a much later right event pushes the right-side
    # watermark far past user 2's window end (0:00+2h), forcing the
    # null emission; user 3's left event arrives too late-in-stream for
    # its own window ever to close.
    spark.createDataFrame([(3, ts(20))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(ldir)
    spark.createDataFrame([(9, ts(20))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(rdir)

    left = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ldir)
    )
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rdir)
    )
    joined = stream_stream_interval_join(
        left,
        right,
        on="user_id",
        interval="2 hours",
        watermark="1 hour",
        how="left_outer",
    )
    import uuid

    name = f"oj_{uuid.uuid4().hex}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # one extra empty-ish cycle so the batch AFTER the watermark
        # advance gets to emit the closed-window null rows
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: real match, right ts joined
    assert len(by_user[1]) == 1 and by_user[1][0]["r_ts"] is not None
    # user 2: window [0:00, 2:00] closed once right watermark hit 19:00
    # → null-padded emission
    assert len(by_user[2]) == 1 and by_user[2][0]["r_ts"] is None
    # user 3 (left at 20:00): window still open at stream end → NO
    # emission, matched or null — the documented no-flush semantics
    assert 3 not in by_user


def test_paced_backfill_batches_and_equality(spark, tmp_path):
    """maxFilesPerTrigger pacing must deliver the directory in
    ceil(files/cap) input batches AND leave the final aggregate
    identical to the batch groupBy."""
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.streaming.pipeline import (
        run_paced_backfill,
    )

    df = spark.range(600).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        (F.col("id") % 3).cast("string").alias("event_type"),
    )
    d = str(tmp_path / "paced6")
    df.repartition(6).write.mode("overwrite").parquet(d)
    res, n_batches = run_paced_backfill(spark, d, files_per_trigger=2)
    assert n_batches == 3
    got = {r["event_type"]: r["n"] for r in res.collect()}
    assert got == {"0": 200, "1": 200, "2": 200}
    # uncapped: one batch, same totals
    res1, nb1 = run_paced_backfill(spark, d, files_per_trigger=6)
    assert nb1 == 1
    assert {r["event_type"]: r["n"] for r in res1.collect()} == got


def test_run_streams_concurrently_failure_leaves_nothing_behind(
    spark, fact_dir
):
    """The consolidated-suite failure contract, pinned: a sibling that
    fails to START must stop every already-running query and drop every
    memory-sink table before the error propagates, and the shuffle conf
    must be restored — a bench loop that catches per-entry errors would
    otherwise time later entries against leaked jobs and sinks."""
    from cassandra_slow_queries_spark.streaming.pipeline import (
        read_fact_stream,
        run_streams_concurrently,
    )

    before_views = {
        t.name for t in spark.catalog.listTables() if "stream_result" in t.name
    }
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")

    good = volume_stream(read_fact_stream(spark, fact_dir))
    batch_not_stream = spark.range(3).toDF("id")  # .writeStream raises
    with pytest.raises(Exception):
        run_streams_concurrently(
            spark, [(good, "complete"), (batch_not_stream, "complete")]
        )

    assert spark.streams.active == []  # no zombie queries
    after_views = {
        t.name for t in spark.catalog.listTables() if "stream_result" in t.name
    }
    assert after_views == before_views  # no leaked memory sinks
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_conf

    # and the helper still works cleanly in the same session afterwards
    [ok] = run_streams_concurrently(
        spark, [(volume_stream(read_fact_stream(spark, fact_dir)), "complete")]
    )
    assert ok.count() > 0
    assert spark.streams.active == []


def test_run_streams_concurrently_release_failure_drops_sinks(
    spark, fact_dir, monkeypatch
):
    """The release phase runs INSIDE the cleanup contract: if
    materializing one finished sink fails, the remaining sink tables
    must still be dropped before the error propagates."""
    from cassandra_slow_queries_spark.streaming import pipeline as sp

    real_release = sp.release_stream_sink
    calls = {"n": 0}

    def flaky_release(session, name):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("planted release failure")
        return real_release(session, name)

    monkeypatch.setattr(sp, "release_stream_sink", flaky_release)
    before_views = {
        t.name for t in spark.catalog.listTables() if "stream_result" in t.name
    }
    good = [
        (volume_stream(read_fact_stream(spark, fact_dir)), "complete"),
        (volume_stream(read_fact_stream(spark, fact_dir)), "complete"),
    ]
    with pytest.raises(RuntimeError, match="planted release failure"):
        sp.run_streams_concurrently(spark, good)
    assert spark.streams.active == []
    after_views = {
        t.name for t in spark.catalog.listTables() if "stream_result" in t.name
    }
    assert after_views == before_views  # both sinks dropped, incl. the
    # one whose release never ran


def test_volume_top_suite_rows_equal_both_standalone_entries(spark):
    """The r11 consolidation contract, pinned directly: the suite entry's
    detail rows must equal the UNION of the two standalone runners it
    replaced in the rotation (complete-mode foreachBatch rank and
    watermarked append-mode closed-window rank), row for row — the
    standalone entries left the driver window, so this pin is what keeps
    the consolidation honest."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata {sf_dir} not present")
    from cassandra_slow_queries_spark.plans.catalog import (
        q_stream_volume_top,
        q_stream_volume_top_append,
        q_stream_volume_top_suite,
    )

    suite = q_stream_volume_top_suite(spark, sf_dir).collect()
    comp = q_stream_volume_top(spark, sf_dir).collect()
    app = q_stream_volume_top_append(spark, sf_dir).collect()

    def key(r, method):
        return (
            method, r["bucket"], r["query"], r["primary_key"],
            r["cnt"], r["duration"], r["avg_duration"],
        )

    suite_rows = sorted(key(r, r["method"]) for r in suite)
    standalone_rows = sorted(
        [key(r, "complete") for r in comp] + [key(r, "append") for r in app]
    )
    assert suite_rows == standalone_rows


def test_window_suite_rows_equal_three_standalone_entries(spark):
    """The r13 consolidation contract, pinned directly: the window-suite
    entry's rows must equal the UNION of the three standalone runners it
    replaced in the rotation (tumbling A4 volume, 2h/1h sliding volume,
    30-minute-gap sessions), row for row after the suite's published
    harmonization — the standalone entries left the driver window, so
    this pin is what keeps the consolidation honest."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata {sf_dir} not present")
    from cassandra_slow_queries_spark.plans.catalog import (
        q_stream_session,
        q_stream_sliding,
        q_stream_volume,
        q_stream_window_suite,
    )

    suite = q_stream_window_suite(spark, sf_dir).collect()
    vol = q_stream_volume(spark, sf_dir).collect()
    sld = q_stream_sliding(spark, sf_dir).collect()
    ses = q_stream_session(spark, sf_dir).collect()

    def norm(v):
        return None if v is None else str(v)

    def num(v):
        return None if v is None else int(v)

    suite_rows = sorted(
        (
            r["method"], norm(r["bucket"]), norm(r["bucket_end"]),
            norm(r["query"]), num(r["cnt"]), num(r["duration"]),
            num(r["avg_duration"]),
        )
        for r in suite
    )
    standalone_rows = sorted(
        [
            ("tumbling", norm(r["bucket"]), None, None, num(r["cnt"]),
             num(r["duration"]), num(r["avg_duration"]))
            for r in vol
        ]
        + [
            ("sliding", norm(r["bucket"]), None, norm(r["query"]),
             num(r["cnt"]), num(r["duration"]), num(r["avg_duration"]))
            for r in sld
        ]
        + [
            ("session", norm(r["session_start"]), norm(r["session_end"]),
             norm(r["query"]), num(r["cnt"]), num(r["duration"]), None)
            for r in ses
        ]
    )
    assert suite_rows == standalone_rows
