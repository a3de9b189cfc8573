"""Structured Streaming tier (SURVEY.md §2.9 / §7 Tier 2).

The reference is batch-only, but its per-minute volume reports
(analyze_slow_queries.py:1053-1075) are textbook tumbling-window
aggregations. This module runs the SAME aggregation expressions over
``readStream`` sources:

- :func:`volume_stream` / :func:`volume_top_cells_stream` — windowed
  streaming aggregations (A4/A5) with optional watermark for unbounded
  sources.
- :func:`run_stream_to_batch` — drive any finite streaming frame to
  completion with ``Trigger.AvailableNow`` and return the final result as
  a batch DataFrame. Aggregations run in ``complete`` mode: with a finite
  input, append mode would hold back every window newer than the
  watermark at end-of-stream, silently dropping the tail — the classic
  finite-stream pitfall.
- :func:`run_volume_top_stream` — the grouped top-K per window (T2).
  Rank-over-window is not allowed inside a streaming aggregation, so the
  rank runs in ``foreachBatch`` over the complete aggregation state —
  exactly the §2.9 plan.

At scale: the streaming agg state is partitioned by window start (and
query/pk for A5) across ``spark.sql.shuffle.partitions`` state stores;
with a watermark, state for closed windows is evicted, so memory is
bounded by (watermark horizon / window size) × key cardinality, not by
stream length.
"""

from __future__ import annotations

import os
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.topk import grouped_top_k
from cassandra_slow_queries_spark.session import scratch_dir

WINDOW = "1 minute"


@contextmanager
def stream_state_partitions(spark: SparkSession, n: str | int | None = None):
    """Run the enclosed streaming query under a state-volume-sized
    ``spark.sql.shuffle.partitions`` (restored on exit, whatever
    happens).

    A streaming query's STATE STORE count is fixed at first batch from
    the session's shuffle-partition conf, and each store is per-batch
    FIXED cost (provider open, commit file, maintenance) regardless of
    how little state it holds — so partition count should track state
    volume (window/key cardinality), not the batch shuffle default
    (r13 opt, generalizing the parity-suite sizing note: measured
    interleaved at sf0.1, eight streaming entries total 25.4 → 16.9 s
    under 8 partitions, every entry ≤ 0.95×, results invariant). The
    default 8 is env-tunable (``SPARK_GRAFT_STREAM_PARTITIONS``) —
    size it to state cardinality / cluster on a real deployment; the
    aggregation results are partition-count-independent either way."""
    n = str(
        n
        if n is not None
        else os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _windowed(parsed: DataFrame, window: str, watermark: str | None) -> DataFrame:
    src = parsed.withWatermark("ts", watermark) if watermark else parsed
    return src.groupBy(F.window("ts", window).alias("_win"))


def volume_stream(
    parsed: DataFrame, window: str = WINDOW, watermark: str | None = None
) -> DataFrame:
    """A4 as a streaming aggregation: per-window count + duration sum +
    truncating average (analyze_slow_queries.py:1053-1061, :1093-1104)."""
    return (
        _windowed(parsed, window, watermark)
        .agg(F.count("*").alias("cnt"), F.sum("duration").alias("duration"))
        .select(
            F.date_format(F.col("_win.start"), "yyyy-MM-dd HH:mm").alias("minute"),
            "cnt",
            "duration",
            F.floor(F.col("duration") / F.col("cnt")).cast("long").alias(
                "avg_duration"
            ),
        )
    )


def sliding_volume_stream(
    parsed: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """A4 volume over SLIDING (overlapping) windows: each event lands in
    ``window/slide`` windows (``F.window(ts, window, slide)``), giving a
    smoothed trailing view per emission instead of tumbling-bucket
    jumps — the shape monitoring dashboards want ("events in the last
    2 h, refreshed hourly").

    Scale: state cardinality multiplies by the overlap factor
    (window/slide) versus tumbling — Spark expands each row into its
    windows before the aggregation, so the shuffle carries the factor
    too. Keep the factor small (2-4×) and use a watermark on unbounded
    sources so closed windows evict; an overlap of 60× (1 h window,
    1 min slide) is better served by tumbling minutes + a trailing
    batch window (operators/timeseries.py:trailing_agg).
    """
    src = parsed.withWatermark("ts", watermark) if watermark else parsed
    return (
        src.groupBy(F.window("ts", window, slide).alias("_win"), "query")
        .agg(F.count("*").alias("cnt"), F.sum("duration").alias("duration"))
        .select(
            F.date_format(F.col("_win.start"), "yyyy-MM-dd HH:mm").alias(
                "bucket"
            ),
            "query",
            "cnt",
            "duration",
            F.floor(F.col("duration") / F.col("cnt")).cast("long").alias(
                "avg_duration"
            ),
        )
    )


def volume_top_cells_stream(
    parsed: DataFrame, window: str = WINDOW, watermark: str | None = None
) -> DataFrame:
    """A5 cells as a streaming aggregation (minute, query, primary_key);
    the per-window top-K rank happens downstream in foreachBatch."""
    src = parsed.withWatermark("ts", watermark) if watermark else parsed
    return (
        src.groupBy(
            F.window("ts", window).alias("_win"),
            "query",
            F.coalesce(F.col("primary_key"), F.lit("")).alias("primary_key"),
        )
        .agg(F.count("*").alias("cnt"), F.sum("duration").alias("duration"))
        .select(
            F.date_format(F.col("_win.start"), "yyyy-MM-dd HH:mm").alias("minute"),
            "query",
            "primary_key",
            "cnt",
            "duration",
            F.floor(F.col("duration") / F.col("cnt")).cast("long").alias(
                "avg_duration"
            ),
        )
    )


def distinct_keys_stream(
    parsed: DataFrame,
    window: str = "1 hour",
    watermark: str = "90 minutes",
) -> DataFrame:
    """Ingestion-time streaming dedup: first occurrence per
    ``(window-bucket, query, primary_key)``, duplicates arriving within
    the watermark horizon dropped — ``(bucket, query, primary_key)``.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    EVICTS it once the watermark passes the first-seen event time, so
    state is bounded by (watermark horizon × key arrival rate), not by
    stream length — the requirement for an unbounded 100 TB/day intake.
    The documented trade: a duplicate arriving after its key's state was
    evicted re-emits (exactly-once dedup only within the horizon);
    cross-horizon dedup is batch territory (operators/dedup.py). Runs in
    append mode — dedup emits rows immediately rather than holding them
    to the watermark, so the finite-stream tail-drop pitfall of
    watermarked aggregations does not apply.
    """
    return (
        parsed.withWatermark("ts", watermark)
        .select(
            F.window("ts", window).start.alias("bucket"),
            "query",
            "primary_key",
            "ts",  # the event-time column must survive into the dedup
        )
        .dropDuplicatesWithinWatermark(["bucket", "query", "primary_key"])
        .drop("ts")
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval: str = "6 hours",
    watermark: str = "12 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair every LEFT event with
    the RIGHT events sharing ``on`` whose event time falls in
    ``[left_ts, left_ts + interval]``.

    ``how="left_outer"`` additionally emits a null-padded row for each
    unmatched left event — but ONLY once the watermark proves no match
    can still arrive (right watermark past ``left_ts + interval``), and
    only in a batch AFTER the one that advanced the watermark. Two
    consequences worth pinning (tests/test_streaming_endpoints.py):
    an unmatched row near the stream's end stays buffered forever (no
    end-of-stream flush), and a single-batch AvailableNow run emits NO
    outer rows at all (the watermark was still the epoch while the
    batch ran). Plan outer streaming joins around watermark delay, not
    query termination.

    Both sides get a watermark and the join condition carries the
    event-time range — the two ingredients Spark REQUIRES to bound
    stream-stream join state: a left row's buffer entry is evictable
    once the right watermark passes ``left_ts + interval``, and vice
    versa, so state is (arrival rate × horizon), not stream length.
    Columns come out prefixed ``l_``/``r_`` (the join key once, from the
    left) to keep the output unambiguous.

    Completeness contract: within one micro-batch the join is exact;
    across micro-batches a row arriving after the opposite side's
    watermark already passed its match window is dropped — that is the
    documented semantics of watermarked joins, not a defect. Under
    ``Trigger.AvailableNow`` with no file cap, a finite directory lands
    in a single batch, so the result equals the batch interval join
    (how the catalog gate pins it against DuckDB).
    """
    l_cols = [c for c in left.columns if c != on]
    r_cols = [c for c in right.columns if c != on]
    l = left.withWatermark(left_ts, watermark).select(
        F.col(on), *[F.col(c).alias(f"l_{c}") for c in l_cols]
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(on).alias("_r_on"), *[F.col(c).alias(f"r_{c}") for c in r_cols]
    )
    lt, rt = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (
        (F.col(on) == F.col("_r_on"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond, how).drop("_r_on")


def start_stream_to_batch(
    streaming_df: DataFrame, output_mode: str = "complete"
):
    """Start a finite streaming frame (``Trigger.AvailableNow`` → memory
    sink) WITHOUT awaiting it; returns ``(query, table_name)``.

    Independent finite streams each pay a fixed micro-batch trigger
    latency floor; starting them concurrently and awaiting afterwards
    overlaps those floors (and their state-store open/commit cost) in
    one wall-clock cycle instead of serializing them (the parity
    suite's three jobs). Each query gets a UUID sink table, so
    concurrent starts never collide."""
    name = f"stream_result_{uuid.uuid4().hex}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    return q, name


def run_streams_concurrently(
    spark: SparkSession,
    builds: list[tuple[DataFrame, str]],
    shuffle_partitions: str | None = None,
) -> list[DataFrame]:
    """Start several finite streaming frames CONCURRENTLY, await them
    all, and return their released results in build order — the shared
    scaffold of the consolidated suite entries (parity, window
    taxonomy), kept in ONE place so the failure contract cannot drift
    between copies.

    Contract pieces, each load-bearing:

    - all queries start before any is awaited, overlapping their fixed
      micro-batch trigger floors and per-partition state-store
      open/commit costs in one wall-clock cycle;
    - they run under a reduced ``spark.sql.shuffle.partitions`` (state
      stores are per-partition FIXED cost, so partition count should
      track state volume, not the batch default) — restored in a
      finally whatever happens;
    - on ANY failure — a start, an await, or a sink RELEASE — every
      live query is stopped and every sink table dropped before the
      error propagates: callers that catch per-entry errors and
      continue (the bench loop) must never inherit live streaming jobs
      or session-lifetime memory sinks.
    """
    started: list = []
    try:
        with stream_state_partitions(spark, shuffle_partitions):
            for stream, mode in builds:
                started.append(start_stream_to_batch(stream, output_mode=mode))
            for q, _ in started:
                q.awaitTermination()
        return [release_stream_sink(spark, name) for _, name in started]
    except Exception:
        for q, name in started:
            try:
                q.stop()
            except Exception:
                pass
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
        raise


def release_stream_sink(spark: SparkSession, name: str) -> DataFrame:
    """Detach a finished memory-sink table: materialize its rows as a
    localCheckpoint and DROP the temp view, returning the checkpointed
    frame.

    A memory sink holds its full result on the driver/executors for the
    SESSION lifetime — a long-lived session running many finite streams
    (a bench loop, a notebook, a scheduled re-analysis) accumulates
    every result ever produced and degrades under GC pressure. The
    checkpointed blocks, by contrast, are released by the ContextCleaner
    once the returned frame is garbage-collected, so each result's
    lifetime is its caller's, not the session's."""
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def run_stream_to_batch(streaming_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a finite streaming frame with ``Trigger.AvailableNow`` into
    an in-memory sink and return the final contents as a batch frame."""
    spark = streaming_df.sparkSession
    with stream_state_partitions(spark):
        q, name = start_stream_to_batch(streaming_df, output_mode)
        q.awaitTermination()
    return release_stream_sink(spark, name)


def run_volume_top_stream(
    parsed: DataFrame,
    k: int,
    order_by: str = "duration",
    window: str = WINDOW,
    watermark: str | None = None,
) -> DataFrame:
    """T2-in-streaming: complete-mode A5 cells → ``foreachBatch`` grouped
    top-K → parquet snapshot, returned as a batch frame.

    ``foreachBatch`` sees the full aggregation state each trigger in
    complete mode, so the rank is always over the whole window population;
    the parquet overwrite makes re-triggers idempotent.
    """
    cells = volume_top_cells_stream(parsed, window, watermark)
    out_dir = scratch_dir("volume_top_stream_")

    def emit(batch_df: DataFrame, _batch_id: int) -> None:
        top = grouped_top_k(
            batch_df, ["minute"], order_by, k, tiebreaks=["query", "primary_key"]
        )
        top.write.mode("overwrite").parquet(out_dir)

    with stream_state_partitions(parsed.sparkSession):
        q = (
            cells.writeStream.foreachBatch(emit)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return parsed.sparkSession.read.parquet(out_dir)


def run_volume_top_stream_append(
    parsed: DataFrame,
    k: int,
    watermark: str = "2 minutes",
    order_by: str = "duration",
    window: str = WINDOW,
) -> DataFrame:
    """Watermarked APPEND-mode per-window top-K — the unbounded-source
    variant of :func:`run_volume_top_stream`.

    Complete mode re-emits (and re-ranks) every window ever seen each
    trigger, so its state grows with the total window count — fine for
    finite re-analysis, fatal on an unbounded stream. Here the
    aggregation runs in append mode: a window's cells are emitted exactly
    once, in the trigger whose watermark passes the window end, and the
    state store evicts them. ``foreachBatch`` therefore sees each closed
    window COMPLETE and exactly once, ranks inside the batch, and appends
    to the sink — no global re-rank, no unbounded state. Late data is
    dropped by the aggregation once the watermark has passed it; note
    Spark evaluates the late-row filter with the PREVIOUS micro-batch's
    watermark (verified empirically), so a late row landing in the same
    trigger that closes its window still merges before emission — the
    emitted window stays complete w.r.t. everything the filter admitted,
    and a row arriving any later is dropped. Windows still open at
    end-of-stream are NOT emitted (a next run resumes from the
    checkpoint and emits them when their time comes).

    State/memory at scale: bounded by (watermark horizon / window size)
    × live key cardinality, independent of stream length. The final
    no-data micro-batch (`spark.sql.streaming.noDataMicroBatches.enabled`,
    default true) flushes windows closed by the last watermark advance.

    The ``_batch_id`` column records which trigger emitted each row —
    the exactly-once emission of closed windows is asserted on it in
    tests/test_streaming_endpoints.py.
    """
    cells = volume_top_cells_stream(parsed, window, watermark)
    out_dir = scratch_dir("volume_top_append_")
    ckpt = scratch_dir("volume_top_append_ckpt_")

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        top = grouped_top_k(
            batch_df, ["minute"], order_by, k, tiebreaks=["query", "primary_key"]
        )
        top.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    with stream_state_partitions(parsed.sparkSession):
        q = (
            cells.writeStream.foreachBatch(emit)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    spark = parsed.sparkSession
    try:
        return spark.read.parquet(out_dir)
    except Exception:
        # no window closed → empty result with the right shape
        return spark.createDataFrame(
            [],
            "minute string, query string, primary_key string, cnt long, "
            "duration long, avg_duration long, _batch_id long",
        )


def read_fact_stream(
    spark: SparkSession, parquet_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a fact-frame parquet directory (the
    materialized ``processed`` intermediate, plans/pipeline.py) — the
    incremental re-analysis path the reference's TODO asks for
    (analyze_slow_queries.py:62)."""
    static = spark.read.parquet(parquet_dir)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(parquet_dir)


def session_stream(
    parsed: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "query",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key SESSION windows as a streaming aggregation —
    ``F.session_window(ts, gap)``: windows grow while events keep
    arriving within ``gap`` of the last one and close when the gap
    elapses, the natural unit for burst/visit analysis where fixed
    buckets split one burst across boundaries.

    Semantics: a session spans [first event, last event + gap); two
    consecutive events start a NEW session iff their separation is
    STRICTLY greater than gap — at exactly gap the windows touch
    ([t, t+gap) then [t+gap, ...)) and Spark coalesces them (verified
    by the boundary test). That closed-form makes the batch
    gaps-and-islands SQL an exact oracle.

    Scale: state per open session, evicted by the watermark on
    unbounded sources (pass one!); the finite catalog drive runs
    complete-mode, where Spark merges sessions across micro-batches in
    the state store. Unlike tumbling/sliding windows there is no row
    expansion — each event lands in exactly one session.
    """
    src = parsed.withWatermark("ts", watermark) if watermark else parsed
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("_s"), key_col
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum("duration").alias("duration"),
        )
        .select(
            F.date_format(F.col("_s.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("_s.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            key_col,
            "cnt",
            "duration",
        )
    )


def _latest_snapshot_version(snapshot_dir: str) -> int | None:
    """Highest COMMITTED ``v=N`` subdirectory under ``snapshot_dir``
    (None when the snapshot has never been written). Committed means
    the ``_SUCCESS`` marker exists, or — for deployments that disable
    marker files (``marksuccessfuljobs=false``, common on object
    stores) — the directory holds data files and no ``_temporary``
    leftover. A fold that crashed between creating ``v=N`` and job
    commit leaves ``_temporary`` (and no marker); adopting it as the
    base would either fail schema inference forever or silently merge
    against a truncated snapshot — recovery must fall back to the last
    version that actually committed."""
    import os
    import re

    def committed(path: str) -> bool:
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return True
        if os.path.exists(os.path.join(path, "_temporary")):
            return False
        try:
            return any(
                n.startswith("part-") for n in os.listdir(path)
            )
        except OSError:
            return False

    if not os.path.isdir(snapshot_dir):
        return None
    best = None
    for name in os.listdir(snapshot_dir):
        m = re.fullmatch(r"v=(\d+)", name)
        if m and committed(os.path.join(snapshot_dir, name)):
            v = int(m.group(1))
            best = v if best is None or v > best else best
    return best


def run_streaming_upsert(
    changes_stream: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    version_cols: list[str],
    tombstone_col: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Maintain a keyed latest-wins SNAPSHOT from a CDC change stream:
    every micro-batch folds into the standing state via
    operators/merge.merge_upsert inside ``foreachBatch`` — the
    streaming half of the lake-maintenance tier (a live `MERGE INTO`
    without a table format).

    Snapshot storage is VERSIONED (``snapshot_dir/v=<N>``): each batch
    reads the latest version and writes the next, which (a) avoids the
    read-overwrite-same-path hazard of folding state in place, and
    (b) makes batch replay after a failure idempotent: whether the
    re-delivered batch folds into the pre-write snapshot (rewriting the
    same next version) or into a snapshot that already absorbed it,
    latest-wins merging of already-present (key, version) rows is a
    no-op — so exactly-once state lands on top of at-least-once
    delivery. Old versions are retention, not cost: each is a compact
    merged snapshot, and a janitor can drop all but the newest M.

    Tombstones are RETAINED in state (the deleted winner keeps its row,
    flag set) and filtered only in the returned final frame. Dropping
    a deleted key from state — what the one-shot batch merge can get
    away with — is WRONG incrementally: a later micro-batch carrying an
    OLDER event for that key would find no state row to lose against
    and resurrect it (the driver oracle caught exactly this: 136 rows
    vs the batch merge's 120 before retention). Same reason Cassandra
    itself keeps tombstones until compaction can prove no older write
    can still arrive.

    Scale: per batch, one decomposable max_by aggregation over
    (snapshot + batch) — state lives in files, not executor memory, so
    snapshot size is bounded by the key space, not the stream length.
    Returns the final snapshot (tombstones filtered) as a batch frame.
    """
    spark = changes_stream.sparkSession
    from cassandra_slow_queries_spark.operators.merge import merge_upsert

    def fold(batch: DataFrame, batch_id: int) -> None:
        latest = _latest_snapshot_version(snapshot_dir)
        if latest is None:
            base = batch.limit(0)
            nxt = 0
        else:
            base = spark.read.parquet(f"{snapshot_dir}/v={latest}")
            nxt = latest + 1
        # tombstone_col=None on purpose: the flag rides as ordinary
        # payload so the deleted winner STAYS in state (retention).
        merged = merge_upsert(base, batch, keys, version_cols)
        merged.write.mode("overwrite").parquet(f"{snapshot_dir}/v={nxt}")

    if checkpoint_dir is None:
        from cassandra_slow_queries_spark.session import scratch_dir

        checkpoint_dir = scratch_dir("upsert_ckpt_")
    with stream_state_partitions(spark):
        q = (
            changes_stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    latest = _latest_snapshot_version(snapshot_dir)
    if latest is None:  # empty stream: nothing was ever written
        empty = changes_stream.sparkSession.createDataFrame(
            [], changes_stream.schema
        )
        if tombstone_col is not None and tombstone_col in empty.columns:
            empty = empty.drop(tombstone_col)  # match the normal path
        return empty
    final = spark.read.parquet(f"{snapshot_dir}/v={latest}")
    if tombstone_col is not None and tombstone_col in final.columns:
        final = final.filter(
            ~F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
        ).drop(tombstone_col)
    return final


def run_stream_drain(
    streaming_df: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Run a stream until its source reports no more available data
    (``processAllAvailable``), then stop, returning the sink contents.

    The finite-drive harness for sources that advance their OWN
    offsets — the pure-Python stream source (sources/pyds.py), a queue
    poller — where ``Trigger.AvailableNow`` only captures the first
    prefetched batch (the planner asks the source once for "what is
    available now" and a simple stream reader can only answer with its
    next read). For file-backed finite streams prefer
    :func:`run_stream_to_batch`'s AvailableNow, which needs no
    blocking drain."""
    name = f"stream_result_{uuid.uuid4().hex}"
    with stream_state_partitions(streaming_df.sparkSession):
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return release_stream_sink(streaming_df.sparkSession, name)


def run_paced_backfill(
    spark: SparkSession,
    parquet_dir: str,
    files_per_trigger: int,
    group_col: str = "event_type",
) -> tuple[DataFrame, int]:
    """Reprocess a finite directory INCREMENTALLY — ``maxFilesPerTrigger``
    paces ``Trigger.AvailableNow`` into multiple bounded micro-batches
    instead of one giant batch. This is how a 100 TB backfill actually
    runs: per-batch working set is capped by the file budget (the
    streaming aggregation's state carries the running totals between
    batches), whereas an uncapped AvailableNow run would land the whole
    directory in one batch whose shuffle must fit the cluster at once.

    Returns ``(final complete-mode counts per group_col, n_batches)``
    where ``n_batches`` counts micro-batches that actually carried input
    rows (trailing empty bookkeeping batches excluded). The final counts
    are EXACTLY the batch groupBy — incremental delivery must not change
    the answer; the catalog entry pins both facts.

    Batch counting reads ``recentProgress``, which Spark truncates to
    roughly ``spark.sql.streaming.numRecentProgressUpdates`` entries
    (default 100) — a silent undercount there would fake a pacing
    failure, so a truncated buffer raises instead. Truncation is
    detected structurally: this runner starts every query on a fresh
    checkpoint, so batch 0 must still be present; if the oldest
    retained progress is a later batch, earlier entries were evicted.
    Raise that conf (or use a larger ``files_per_trigger``) when pacing
    a directory into more batches than the buffer holds.
    """
    stream = read_fact_stream(spark, parquet_dir, files_per_trigger)
    agg = stream.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    name = f"paced_backfill_{uuid.uuid4().hex}"
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    progresses = q.recentProgress
    if not progresses or min(p["batchId"] for p in progresses) > 0:
        raise RuntimeError(
            "paced backfill produced more micro-batches than "
            "recentProgress retains (batch 0 already evicted) — the "
            "batch count would silently undercount; raise "
            "spark.sql.streaming.numRecentProgressUpdates or use a "
            "larger files_per_trigger"
        )
    n_batches = len(
        {p["batchId"] for p in progresses if p["numInputRows"] > 0}
    )
    return release_stream_sink(spark, name), n_batches
